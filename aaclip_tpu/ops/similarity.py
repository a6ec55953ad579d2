"""The anomaly-map hot path.

Reference semantics (forward_utils.py:196-216, test.py:83-93):

* per level: ``scores = 100 * patch_feats @ anchors`` -> [B, L, 2], reshaped
  to a [B, 2, H, H] grid;
* train: bilinear-upsample (align_corners=True) both channels to the image
  size, then softmax over the channel axis;
* test: collapse to ``(abnormal + 1 - normal) / 2``, Gaussian-blur
  (domain-dependent kernel), upsample, and sum the four per-level maps;
  the image score is ``(det . anchors[:, 1] + 1) / 2``.

TPU-first formulation: blur and upsample are both linear, and identical
across levels, so the test path folds them into ONE precomputed
``M = Upsample @ Blur`` matrix [img, grid] and applies it once to the
level-summed low-res map:

    sum_l U B q_l B^T U^T  ==  M (sum_l q_l) M^T

Per image that is two small matmuls instead of the reference's
4 x (blur + 518^2-pixel bilinear) chain — an exact rewrite, not an
approximation.  For training, softmax over 2 channels is computed as a
sigmoid of the upsampled logit *difference*, halving the upsample work
(again exact: softmax([a, b]) = (sigmoid(a-b), sigmoid(b-a)) and upsampling
is linear).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from aaclip_tpu.ops.blur import DOMAIN_BLUR, gaussian_blur_matrix
from aaclip_tpu.ops.resize import bilinear_matrix


def level_scores(seg_tokens: jax.Array, anchors: jax.Array) -> jax.Array:
    """``100 * feats @ anchors`` for stacked levels.

    seg_tokens: [n_levels, B, L, C]; anchors: [B, C, 2] or [C, 2]
    -> [n_levels, B, L, 2]
    """
    if anchors.ndim == 2:
        return 100.0 * jnp.einsum("nblc,ck->nblk", seg_tokens, anchors,
                                  preferred_element_type=jnp.float32, precision="highest")
    return 100.0 * jnp.einsum("nblc,bck->nblk", seg_tokens, anchors,
                              preferred_element_type=jnp.float32, precision="highest")


@functools.lru_cache(maxsize=16)
def fused_postproc_matrix(grid: int, img_size: int, domain: str) -> np.ndarray:
    """M = bilinear_upsample(align_corners=True) @ gaussian_blur(reflect),
    [img_size, grid]."""
    k, s = DOMAIN_BLUR[domain]
    B = gaussian_blur_matrix(grid, k, s)
    U = bilinear_matrix(grid, img_size, align_corners=True)
    return (U @ B).astype(np.float32)


def apply_postproc_matrix(q: jax.Array, M: jax.Array,
                          precision="highest") -> jax.Array:
    """[B, g, h] grid maps -> [B, I, J] pixel maps: the fused two-sided
    application ``M q Mᵀ`` (blur+upsample folded into ``M`` by
    ``fused_postproc_matrix`` for eval, plain bilinear upsampling by
    ``bilinear_matrix`` for the training logit).  The ONE implementation
    of this parity-critical transform — eval_anomaly_map,
    train_similarity_logit, eval/predict, and parallel/pipeline all route
    through it."""
    out = jnp.einsum("Ig,bgh->bIh", M, q,
                     preferred_element_type=jnp.float32, precision=precision)
    return jnp.einsum("Jh,bIh->bIJ", M, out,
                      preferred_element_type=jnp.float32, precision=precision)


def eval_anomaly_map(
    seg_tokens: jax.Array,
    anchors: jax.Array,
    img_size: int,
    domain: str,
) -> jax.Array:
    """Fused test-time pixel anomaly map.

    seg_tokens: [n_levels, B, L, C] L2-normalized patch embeddings;
    anchors: [C, 2] (single class) or [B, C, 2].
    Returns [B, img_size, img_size] = the sum over levels of the reference's
    per-level blurred+upsampled ``(abnormal + 1 - normal)/2`` maps.
    """
    _, Bsz, L, _ = seg_tokens.shape
    grid = int(round(L ** 0.5))
    scores = level_scores(seg_tokens, anchors)          # [n, B, L, 2]
    q = collapse_level_scores(scores).reshape(Bsz, grid, grid)
    M = jnp.asarray(fused_postproc_matrix(grid, img_size, domain))
    return apply_postproc_matrix(q, M)


def collapse_level_scores(scores: jax.Array) -> jax.Array:
    """[n_levels, B, L, 2] per-level scores -> [B, L] grid map: the sum over
    levels of the reference's per-level ``(abnormal + 1 - normal) / 2``
    (test.py:87-93) — the ``+ n/2`` constant folds out of the per-level
    ``+1``s because the blur+upsample matrix rows sum to 1.  The ONE
    definition of this parity-critical collapse; eval/predict routes
    through it (parallel/pipeline computes the same identity as per-stage
    partial sums inside shard_map — pinned by its equality tests)."""
    n_levels = scores.shape[0]
    return (scores[..., 1] - scores[..., 0]).sum(axis=0) * 0.5 + n_levels * 0.5


def image_score(det: jax.Array, anchors: jax.Array) -> jax.Array:
    """Test-time image-level score ``(det . abnormal_anchor + 1) / 2``
    (reference test.py:83-84).  Precision pinned like level_scores: under
    the fp32 parity policy this dot must not run as a default-precision
    (bf16-pass) TPU matmul."""
    if anchors.ndim == 2:
        s = jnp.einsum("bc,c->b", det, anchors[:, 1],
                       preferred_element_type=jnp.float32,
                       precision="highest")
    else:
        s = jnp.einsum("bc,bc->b", det, anchors[:, :, 1],
                       preferred_element_type=jnp.float32,
                       precision="highest")
    return (s + 1.0) / 2.0


def train_similarity_logit(level_score: jax.Array, img_size: int) -> jax.Array:
    """Upsampled (align_corners=True) abnormal-minus-normal logit map.

    level_score: [B, L, 2] -> [B, img_size, img_size] logit difference d such
    that the reference's softmaxed channels are (sigmoid(-d), sigmoid(d)).
    """
    Bsz, L, _ = level_score.shape
    grid = int(round(L ** 0.5))
    d = (level_score[..., 1] - level_score[..., 0]).reshape(Bsz, grid, grid)
    U = jnp.asarray(bilinear_matrix(grid, img_size, align_corners=True))
    return apply_postproc_matrix(d, U)


def train_similarity_probs(level_score: jax.Array, img_size: int) -> jax.Array:
    """Reference-layout [B, 2, img, img] softmax probability maps (train
    mode of forward_utils.py:196-216).  Prefer consuming the logit from
    ``train_similarity_logit`` in losses; this is the parity-friendly view.
    """
    d = train_similarity_logit(level_score, img_size)
    p1 = jax.nn.sigmoid(d)
    return jnp.stack([1.0 - p1, p1], axis=1)


def reference_similarity_map(
    patch_feats: jax.Array,
    anchors: jax.Array,
    img_size: int,
    *,
    test: bool = False,
    domain: str = "Medical",
) -> jax.Array:
    """Direct port of ``calculate_similarity_map`` semantics for a single
    level — used by tests to validate the fused paths against a
    straightforward implementation.

    patch_feats: [B, L, C]; anchors: [B, C, 2] or [C, 2].
    """
    from aaclip_tpu.ops.resize import resize_bilinear_2d

    if anchors.ndim == 2:
        scores = 100.0 * jnp.einsum("blc,ck->blk", patch_feats, anchors)
    else:
        scores = 100.0 * jnp.einsum("blc,bck->blk", patch_feats, anchors)
    Bsz, L, C = scores.shape
    grid = int(round(L ** 0.5))
    pred = scores.transpose(0, 2, 1).reshape(Bsz, C, grid, grid)
    if test:
        k, s = DOMAIN_BLUR[domain]
        Bm = jnp.asarray(gaussian_blur_matrix(grid, k, s))
        p = (pred[:, 1] + 1.0 - pred[:, 0]) / 2.0
        p = jnp.einsum("Ig,bgh->bIh", Bm, p)
        p = jnp.einsum("Jh,bIh->bIJ", Bm, p)
        p = resize_bilinear_2d(p[:, None], (img_size, img_size))
        return p[:, 0]
    up = resize_bilinear_2d(pred, (img_size, img_size))
    return jax.nn.softmax(up, axis=1)
