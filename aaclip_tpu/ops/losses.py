"""Training losses.

Numerics follow the reference exactly (forward_utils.py:21-126, :223-227,
train.py:91-96,148-150):

* FocalLoss: gamma=2, label smoothing 1e-5 via one-hot clamping, applied to
  *probabilities* (the similarity maps are softmaxed before the loss), mean
  reduction.
* BinaryDiceLoss: smooth=1, per-sample flattening.
* seg loss = focal(probs, mask) + dice(p_normal, 1-mask) + dice(p_abnormal, mask).
* image-level CE on ``det @ anchors`` logits, and the squared mean
  normal/abnormal anchor dot product ("orthogonality") term.

Each loss also has a fused form that consumes the single upsampled
logit-difference map d (p_abnormal = sigmoid(d)) to avoid materializing both
518^2 probability channels.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_FOCAL_SMOOTH = 1e-5
_FOCAL_GAMMA = 2.0
_DICE_SMOOTH = 1.0


def focal_loss_probs(probs: jax.Array, target: jax.Array) -> jax.Array:
    """probs: [B, C, ...spatial]; target: [B, ...spatial] in {0..C-1}."""
    C = probs.shape[1]
    p = jnp.moveaxis(probs, 1, -1).reshape(-1, C).astype(jnp.float32)
    t = target.reshape(-1).astype(jnp.int32)
    one_hot = jax.nn.one_hot(t, C, dtype=jnp.float32)
    one_hot = jnp.clip(one_hot, _FOCAL_SMOOTH / (C - 1), 1.0 - _FOCAL_SMOOTH)
    pt = jnp.sum(one_hot * p, axis=1) + _FOCAL_SMOOTH
    logpt = jnp.log(pt)
    return jnp.mean(-((1.0 - pt) ** _FOCAL_GAMMA) * logpt)


def dice_loss(pred: jax.Array, target: jax.Array) -> jax.Array:
    """pred/target: [B, ...spatial] soft masks."""
    return 1.0 - jnp.mean(_dice_eff(pred.astype(jnp.float32),
                                    target.astype(jnp.float32)))


def seg_loss_probs(probs: jax.Array, mask: jax.Array) -> jax.Array:
    """Reference calculate_seg_loss on [B, 2, H, W] probability maps."""
    m = mask.reshape(mask.shape[0], *probs.shape[-2:])
    return (
        focal_loss_probs(probs, m)
        + dice_loss(probs[:, 0], 1.0 - m)
        + dice_loss(probs[:, 1], m)
    )


def seg_loss_from_logit(d: jax.Array, mask: jax.Array) -> jax.Array:
    """Fused seg loss from the logit-difference map d = logit(abnormal) -
    logit(normal), [B, H, W]; mask must be reshapeable to d.shape (same
    element count), values in [0, 1] — the focal target follows the
    reference's int truncation (``target.long()``), so only an exact 1.0
    counts as anomalous.

    Exactly equals ``seg_loss_probs(stack([1-sigmoid(d), sigmoid(d)]), mask)``.
    """
    d = d.astype(jnp.float32)
    m = mask.reshape(d.shape).astype(jnp.float32)
    p1 = jax.nn.sigmoid(d)
    focal = jnp.mean(_focal_terms_from_logit(d, m))
    return focal + dice_loss(1.0 - p1, 1.0 - m) + dice_loss(p1, m)


def _focal_terms_from_logit(d: jax.Array, m: jax.Array) -> jax.Array:
    p1 = jax.nn.sigmoid(d)
    # m >= 1.0 mirrors focal_loss_probs's int truncation (the reference's
    # target.long()): a soft mask value below 1.0 is class 0 in both paths
    p_t = jnp.where(m >= 1.0, p1, 1.0 - p1)
    pt = (1.0 - 2.0 * _FOCAL_SMOOTH) * p_t + 2.0 * _FOCAL_SMOOTH
    return -((1.0 - pt) ** _FOCAL_GAMMA) * jnp.log(pt)


def _dice_eff(p: jax.Array, t: jax.Array) -> jax.Array:
    """Per-sample dice efficiency, [B]."""
    B = p.shape[0]
    pf = p.reshape(B, -1)
    tf = t.reshape(B, -1)
    inter = jnp.sum(pf * tf, axis=1)
    return (2.0 * inter + _DICE_SMOOTH) / (jnp.sum(pf, axis=1) + jnp.sum(tf, axis=1) + _DICE_SMOOTH)


def seg_loss_from_logit_masked(d: jax.Array, mask: jax.Array,
                               valid: jax.Array) -> jax.Array:
    """``seg_loss_from_logit`` restricted to valid samples (padded batches);
    equal to the unmasked loss when all samples are valid."""
    d = d.astype(jnp.float32)
    m = mask.reshape(d.shape).astype(jnp.float32)
    v = valid.astype(jnp.float32)
    n_valid = jnp.maximum(jnp.sum(v), 1.0)
    per_pixel = _focal_terms_from_logit(d, m)  # [B, H, W]
    focal = jnp.sum(per_pixel * v[:, None, None]) / (
        n_valid * per_pixel.shape[1] * per_pixel.shape[2])
    p1 = jax.nn.sigmoid(d)
    eff0 = _dice_eff(1.0 - p1, 1.0 - m)
    eff1 = _dice_eff(p1, m)
    dice = (1.0 - jnp.sum(eff0 * v) / n_valid) + (1.0 - jnp.sum(eff1 * v) / n_valid)
    return focal + dice


def cross_entropy_logits_masked(logits: jax.Array, labels: jax.Array,
                                valid: jax.Array) -> jax.Array:
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, labels[:, None].astype(jnp.int32), axis=1)[:, 0]
    v = valid.astype(jnp.float32)
    return jnp.sum(nll * v) / jnp.maximum(jnp.sum(v), 1.0)


def orthogonality_loss_masked(anchors: jax.Array, valid: jax.Array) -> jax.Array:
    dots = jnp.sum(anchors[:, :, 0] * anchors[:, :, 1], axis=1)
    v = valid.astype(jnp.float32)
    return (jnp.sum(dots * v) / jnp.maximum(jnp.sum(v), 1.0)) ** 2


def cross_entropy_logits(logits: jax.Array, labels: jax.Array) -> jax.Array:
    """torch F.cross_entropy (mean) on [B, C] logits, int labels."""
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    return -jnp.mean(jnp.take_along_axis(logp, labels[:, None].astype(jnp.int32), axis=1))


def orthogonality_loss(anchors: jax.Array) -> jax.Array:
    """((normal . abnormal per sample).mean())^2 (reference train.py:91-96).

    anchors: [B, C, 2].
    """
    dots = jnp.sum(anchors[:, :, 0] * anchors[:, :, 1], axis=1)
    return jnp.mean(dots) ** 2
