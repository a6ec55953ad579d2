"""Fast-path (bf16 + tanh GELU + uint8 preprocessing) quality: rankings
must track the fp32 parity path closely — pixel AUROC computed from the
two paths on the same data should agree to well under the 0.2-point
parity budget."""

import numpy as np
import jax
import jax.numpy as jnp

from aaclip_tpu.core.config import AdapterConfig, DtypePolicy, get_config
from aaclip_tpu.core.params import create_clip_params, init_adapter_params
from aaclip_tpu.data.transforms import CLIP_MEAN, CLIP_STD
from aaclip_tpu.eval.metrics import auroc
from aaclip_tpu.eval.predict import make_predict_fn
from aaclip_tpu.ops.similarity import fused_postproc_matrix

CFG = get_config("tiny-test")
ACFG = AdapterConfig(levels=(1, 2), image_adapt_until=1, text_adapt_until=1)


def test_bf16_fast_path_tracks_fp32_rankings():
    clip = create_clip_params(CFG, seed=0)
    adapters = init_adapter_params(jax.random.PRNGKey(1), CFG, ACFG)
    rng = np.random.default_rng(2)
    B, S = 8, 70
    u8 = rng.integers(0, 256, (B, 3, S, S), dtype=np.uint8)
    f32 = (u8.astype(np.float32) / 255.0 - CLIP_MEAN[None, :, None, None]) \
        / CLIP_STD[None, :, None, None]
    anchors = rng.standard_normal((CFG.embed_dim, 2)).astype(np.float32)
    anchors /= np.linalg.norm(anchors, axis=0, keepdims=True)
    anchors = jnp.asarray(anchors)
    M = jnp.asarray(fused_postproc_matrix(CFG.vision.grid, S, "Industrial"))

    p_fp32 = make_predict_fn(clip, CFG, ACFG, policy=DtypePolicy.fp32())
    p_fast = make_predict_fn(clip, CFG, ACFG, policy=DtypePolicy.bf16(),
                             uint8_inputs=True)
    pix_a, score_a = p_fp32(adapters["image"], jnp.asarray(f32), anchors, M)
    pix_b, score_b = p_fast(adapters["image"], jnp.asarray(u8), anchors, M)

    pix_a = np.asarray(pix_a)
    pix_b = np.asarray(pix_b)
    # per-pixel correlation of the two maps must be near-perfect
    corr = np.corrcoef(pix_a.reshape(-1), pix_b.reshape(-1))[0, 1]
    assert corr > 0.999, corr
    # AUROC against an arbitrary threshold labeling of the fp32 map:
    # the fast path must reproduce the same ranking to < 0.002 AUROC
    labels = pix_a.reshape(-1) > np.quantile(pix_a, 0.9)
    a_fp32 = auroc(labels, pix_a.reshape(-1))
    a_fast = auroc(labels, pix_b.reshape(-1))
    assert abs(a_fp32 - a_fast) < 0.002, (a_fp32, a_fast)
    np.testing.assert_allclose(np.asarray(score_b), np.asarray(score_a),
                               atol=5e-3)


def test_predict_per_sample_anchors_match_shared():
    """[B, D, 2] anchors (mixed-class serving batches): rows equal to the
    shared [D, 2] anchors must reproduce the shared-anchor outputs, and
    per-row anchors must select that row's class."""
    clip = create_clip_params(CFG, seed=0)
    adapters = init_adapter_params(jax.random.PRNGKey(1), CFG, ACFG)
    rng = np.random.default_rng(3)
    B, S = 4, 70
    imgs = jnp.asarray(rng.standard_normal((B, 3, S, S)), jnp.float32)
    a1 = rng.standard_normal((CFG.embed_dim, 2)).astype(np.float32)
    a1 /= np.linalg.norm(a1, axis=0, keepdims=True)
    a2 = rng.standard_normal((CFG.embed_dim, 2)).astype(np.float32)
    a2 /= np.linalg.norm(a2, axis=0, keepdims=True)
    M = jnp.asarray(fused_postproc_matrix(CFG.vision.grid, S, "Industrial"))
    predict = make_predict_fn(clip, CFG, ACFG, policy=DtypePolicy.fp32())

    pix1, sc1 = predict(adapters["image"], imgs, jnp.asarray(a1), M)
    pix2, sc2 = predict(adapters["image"], imgs, jnp.asarray(a2), M)
    mixed = jnp.asarray(np.stack([a1, a2, a1, a2]))       # [B, D, 2]
    pixm, scm = predict(adapters["image"], imgs, mixed, M)
    for i, (p_ref, s_ref) in enumerate([(pix1, sc1), (pix2, sc2),
                                        (pix1, sc1), (pix2, sc2)]):
        np.testing.assert_allclose(np.asarray(pixm[i]),
                                   np.asarray(p_ref[i]), atol=1e-5)
        np.testing.assert_allclose(np.asarray(scm[i]),
                                   np.asarray(s_ref[i]), atol=1e-6)
