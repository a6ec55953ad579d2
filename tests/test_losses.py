"""Loss parity: focal / dice / seg-loss / CE / orthogonality against
independent torch formulations of the reference math
(forward_utils.py:21-126,223-227; train.py:91-96,148-150)."""

import numpy as np
import jax.numpy as jnp
import torch
import torch.nn.functional as F

from aaclip_tpu.ops import losses as LL


def _torch_focal(probs: torch.Tensor, target: torch.Tensor,
                 gamma=2.0, smooth=1e-5) -> torch.Tensor:
    """Reference focal loss math: probs [N, C], int target [N]."""
    C = probs.shape[1]
    one_hot = torch.zeros_like(probs).scatter_(1, target[:, None].long(), 1.0)
    one_hot = one_hot.clamp(smooth / (C - 1), 1.0 - smooth)
    pt = (one_hot * probs).sum(1) + smooth
    return (-(1 - pt) ** gamma * pt.log()).mean()


def _torch_dice(pred: torch.Tensor, target: torch.Tensor) -> torch.Tensor:
    N = target.shape[0]
    p = pred.reshape(N, -1)
    t = target.reshape(N, -1)
    inter = (p * t).sum(1)
    eff = (2 * inter + 1) / (p.sum(1) + t.sum(1) + 1)
    return 1 - eff.sum() / N


def _probs_and_mask(b=2, h=6, seed=0):
    rng = np.random.default_rng(seed)
    d = rng.standard_normal((b, h, h)).astype(np.float32) * 2
    p1 = 1.0 / (1.0 + np.exp(-d))
    probs = np.stack([1 - p1, p1], axis=1)
    mask = (rng.random((b, h, h)) > 0.6).astype(np.float32)
    return d, probs, mask


def test_focal_matches_torch():
    _, probs, mask = _probs_and_mask()
    pt = torch.from_numpy(np.moveaxis(probs, 1, -1).reshape(-1, 2))
    tt = torch.from_numpy(mask.reshape(-1))
    want = _torch_focal(pt, tt).item()
    got = float(LL.focal_loss_probs(jnp.asarray(probs), jnp.asarray(mask)))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_dice_matches_torch():
    _, probs, mask = _probs_and_mask(seed=1)
    want = _torch_dice(torch.from_numpy(probs[:, 1]),
                       torch.from_numpy(mask)).item()
    got = float(LL.dice_loss(jnp.asarray(probs[:, 1]), jnp.asarray(mask)))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_seg_loss_probs_and_fused_logit_agree():
    d, probs, mask = _probs_and_mask(seed=2)
    via_probs = float(LL.seg_loss_probs(jnp.asarray(probs), jnp.asarray(mask)))
    via_logit = float(LL.seg_loss_from_logit(jnp.asarray(d), jnp.asarray(mask)))
    np.testing.assert_allclose(via_logit, via_probs, rtol=1e-5)
    # and against independent torch composition
    pt = torch.from_numpy(np.moveaxis(probs, 1, -1).reshape(-1, 2))
    tt = torch.from_numpy(mask.reshape(-1))
    want = (
        _torch_focal(pt, tt)
        + _torch_dice(torch.from_numpy(probs[:, 0]), torch.from_numpy(1 - mask))
        + _torch_dice(torch.from_numpy(probs[:, 1]), torch.from_numpy(mask))
    ).item()
    np.testing.assert_allclose(via_probs, want, rtol=1e-5)


def test_seg_loss_fused_logit_agrees_on_soft_masks():
    """Non-binary masks: the fused focal target must follow the same int
    truncation (the reference's ``target.long()``) as the probs path, so a
    soft mask value in (0.5, 1.0) is class 0 in BOTH — a ``> 0.5`` fused
    threshold would silently diverge here while staying green on the
    binary masks every other test uses."""
    d, probs, mask = _probs_and_mask(seed=5)
    rng = np.random.default_rng(6)
    soft = np.where(mask > 0, 1.0,
                    rng.uniform(0.0, 0.999, mask.shape)).astype(np.float32)
    assert ((soft > 0.5) & (soft < 1.0)).any()  # the distinguishing band
    via_probs = float(LL.seg_loss_probs(jnp.asarray(probs), jnp.asarray(soft)))
    via_logit = float(LL.seg_loss_from_logit(jnp.asarray(d), jnp.asarray(soft)))
    np.testing.assert_allclose(via_logit, via_probs, rtol=1e-5)
    # and against the reference torch composition, whose focal target goes
    # through .long() while dice consumes the soft mask as-is
    pt = torch.from_numpy(np.moveaxis(probs, 1, -1).reshape(-1, 2))
    tt = torch.from_numpy(soft.reshape(-1))
    want = (
        _torch_focal(pt, tt)
        + _torch_dice(torch.from_numpy(probs[:, 0]), torch.from_numpy(1 - soft))
        + _torch_dice(torch.from_numpy(probs[:, 1]), torch.from_numpy(soft))
    ).item()
    np.testing.assert_allclose(via_probs, want, rtol=1e-5)


def test_cross_entropy_matches_torch():
    rng = np.random.default_rng(3)
    logits = rng.standard_normal((4, 2)).astype(np.float32)
    labels = np.array([0, 1, 1, 0])
    want = F.cross_entropy(torch.from_numpy(logits),
                           torch.from_numpy(labels)).item()
    got = float(LL.cross_entropy_logits(jnp.asarray(logits), jnp.asarray(labels)))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_orthogonality_loss():
    rng = np.random.default_rng(4)
    a = rng.standard_normal((3, 8, 2)).astype(np.float32)
    want = float(np.mean(np.sum(a[:, :, 0] * a[:, :, 1], axis=1)) ** 2)
    got = float(LL.orthogonality_loss(jnp.asarray(a)))
    np.testing.assert_allclose(got, want, rtol=1e-5)
