"""Fused uint8 preprocessing: folding CLIP normalization into the patchify
matmul must equal host-normalized float inputs."""

import numpy as np
import jax
import jax.numpy as jnp

from aaclip_tpu.core.config import AdapterConfig, DtypePolicy, get_config
from aaclip_tpu.core.params import create_clip_params, init_adapter_params
from aaclip_tpu.data.transforms import CLIP_MEAN, CLIP_STD
from aaclip_tpu.eval.predict import make_predict_fn
from aaclip_tpu.models.vit import patchify
from aaclip_tpu.ops.preprocess import (
    fold_normalization_into_conv1,
    patchify_uint8,
)
from aaclip_tpu.ops.similarity import fused_postproc_matrix

CFG = get_config("tiny-test")
ACFG = AdapterConfig(levels=(1, 2), image_adapt_until=1, text_adapt_until=1)


def _uint8_batch(b=2, s=70, seed=0):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, (b, 3, s, s), dtype=np.uint8)


def _normalize(u8):
    x = u8.astype(np.float32) / 255.0
    return (x - CLIP_MEAN[None, :, None, None]) / CLIP_STD[None, :, None, None]


def test_folded_patchify_matches_normalized():
    clip = create_clip_params(CFG, seed=0)
    w = clip["visual"]["conv1"]["w"]
    u8 = _uint8_batch()
    want = np.asarray(patchify(jnp.asarray(_normalize(u8)), w,
                               CFG.vision.patch_size,
                               DtypePolicy.fp32()))
    w_f, b_f = fold_normalization_into_conv1(w, CFG.vision.patch_size)
    got = np.asarray(patchify_uint8(jnp.asarray(u8), w_f, b_f,
                                    CFG.vision.patch_size,
                                    compute_dtype=jnp.float32,
                                    precision="highest"))
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)


def test_predict_uint8_matches_float():
    clip = create_clip_params(CFG, seed=0)
    adapters = init_adapter_params(jax.random.PRNGKey(1), CFG, ACFG)
    policy = DtypePolicy.fp32()
    p_float = make_predict_fn(clip, CFG, ACFG, policy=policy)
    p_u8 = make_predict_fn(clip, CFG, ACFG, policy=policy, uint8_inputs=True)
    u8 = _uint8_batch(seed=3)
    anchors = jnp.asarray(np.random.default_rng(4).standard_normal((CFG.embed_dim, 2)),
                          jnp.float32)
    anchors = anchors / jnp.linalg.norm(anchors, axis=0, keepdims=True)
    M = jnp.asarray(fused_postproc_matrix(CFG.vision.grid, 70, "Industrial"))
    pix_f, score_f = p_float(adapters["image"], jnp.asarray(_normalize(u8)),
                             anchors, M)
    pix_u, score_u = p_u8(adapters["image"], jnp.asarray(u8), anchors, M)
    np.testing.assert_allclose(np.asarray(pix_u), np.asarray(pix_f),
                               atol=5e-3, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(score_u), np.asarray(score_f),
                               atol=1e-4)
