"""Numerical parity of the resize / blur / similarity ops against torch
reference semantics (F.interpolate align_corners, reflect-padded Gaussian
conv), and exactness of the fused anomaly-map rewrite."""

import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from aaclip_tpu.ops.blur import gaussian_blur_matrix, gaussian_kernel_1d
from aaclip_tpu.ops.resize import resize_bilinear_2d
from aaclip_tpu.ops.similarity import (
    fused_postproc_matrix,
    image_score,
    reference_similarity_map,
    eval_anomaly_map,
    train_similarity_logit,
    train_similarity_probs,
)


def test_bilinear_matrix_matches_torch_align_corners():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 1, 37, 37)).astype(np.float32)
    want = F.interpolate(torch.from_numpy(x), size=(518, 518),
                         mode="bilinear", align_corners=True).numpy()
    got = np.asarray(resize_bilinear_2d(jnp.asarray(x), (518, 518),
                                        align_corners=True))
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-5)


def test_bilinear_matrix_no_align_corners():
    rng = np.random.default_rng(1)
    x = rng.standard_normal((1, 1, 16, 16)).astype(np.float32)
    want = F.interpolate(torch.from_numpy(x), size=(37, 37),
                         mode="bilinear", align_corners=False).numpy()
    got = np.asarray(resize_bilinear_2d(jnp.asarray(x), (37, 37),
                                        align_corners=False))
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-5)


@pytest.mark.parametrize("ksize,sigma", [(7, 1.0), (9, 1.5)])
def test_gaussian_blur_matrix_matches_torch_reflect_conv(ksize, sigma):
    """Separable reflect-padded Gaussian conv == matrix form (kornia
    gaussian_blur2d semantics)."""
    n = 37
    rng = np.random.default_rng(2)
    x = rng.standard_normal((3, 1, n, n)).astype(np.float32)
    g = torch.from_numpy(gaussian_kernel_1d(ksize, sigma))
    t = torch.from_numpy(x)
    pad = ksize // 2
    tp = F.pad(t, (pad, pad, pad, pad), mode="reflect")
    k2d = (g[:, None] @ g[None, :])[None, None]
    want = F.conv2d(tp, k2d).numpy()
    B = gaussian_blur_matrix(n, ksize, sigma)
    got = np.einsum("Ig,bcgh->bcIh", B, x)
    got = np.einsum("Jh,bcIh->bcIJ", B, got)
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)


def _fake_tokens(levels=4, b=2, grid=7, c=16, seed=3):
    rng = np.random.default_rng(seed)
    t = rng.standard_normal((levels, b, grid * grid, c)).astype(np.float32)
    t /= np.linalg.norm(t, axis=-1, keepdims=True)
    a = rng.standard_normal((c, 2)).astype(np.float32)
    a /= np.linalg.norm(a, axis=0, keepdims=True)
    return jnp.asarray(t), jnp.asarray(a)


@pytest.mark.parametrize("domain", ["Industrial", "Medical"])
def test_fused_test_map_equals_per_level_reference(domain):
    """The folded M (sum q_l) M^T rewrite must equal the reference's
    per-level blur -> upsample -> sum chain."""
    img = 98
    toks, anchors = _fake_tokens()
    fused = np.asarray(eval_anomaly_map(toks, anchors, img, domain))
    per_level = sum(
        np.asarray(reference_similarity_map(toks[l], anchors, img,
                                            test=True, domain=domain))
        for l in range(toks.shape[0])
    )
    np.testing.assert_allclose(fused, per_level, atol=1e-3, rtol=1e-4)


def test_train_probs_equal_reference_softmax_path():
    toks, anchors = _fake_tokens(levels=1)
    img = 98
    probs = np.asarray(train_similarity_probs(
        100.0 * jnp.einsum("blc,ck->blk", toks[0], anchors), img))
    ref = np.asarray(reference_similarity_map(toks[0], anchors, img, test=False))
    np.testing.assert_allclose(probs, ref, atol=1e-5, rtol=1e-5)
    # and the logit path is consistent
    d = np.asarray(train_similarity_logit(
        100.0 * jnp.einsum("blc,ck->blk", toks[0], anchors), img))
    np.testing.assert_allclose(1.0 / (1.0 + np.exp(-d)), probs[:, 1],
                               atol=1e-5, rtol=1e-5)


def test_image_score():
    det = jnp.asarray([[1.0, 0.0], [0.0, 1.0]])
    anchors = jnp.asarray([[0.6, 0.8], [0.8, -0.6]]).T.reshape(2, 2)
    anchors = jnp.asarray([[0.6, 0.8], [0.8, -0.6]])  # [C=2, 2]
    s = np.asarray(image_score(det, anchors))
    np.testing.assert_allclose(s, [(0.8 + 1) / 2, (-0.6 + 1) / 2], atol=1e-6)


def test_fused_postproc_matrix_shape():
    M = fused_postproc_matrix(37, 518, "Industrial")
    assert M.shape == (518, 37)
    # rows are convex-ish combinations (blur + bilinear both sum to 1)
    np.testing.assert_allclose(M.sum(axis=1), np.ones(518), atol=1e-5)
