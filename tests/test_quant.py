"""int8 quantized inference (--precision int8, ops/quant.py): unit error
bounds for the quantizers, layer-level agreement with the float path, and
the task-level quality gate mirroring the bf16 fast path's
(test_fast_path_quality.py)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from aaclip_tpu.core.config import AdapterConfig, DtypePolicy, get_config
from aaclip_tpu.core.params import create_clip_params, init_adapter_params
from aaclip_tpu.data.transforms import CLIP_MEAN, CLIP_STD
from aaclip_tpu.eval.metrics import auroc
from aaclip_tpu.eval.predict import make_predict_fn
from aaclip_tpu.models import layers as L
from aaclip_tpu.ops import quant as Q
from aaclip_tpu.ops.similarity import fused_postproc_matrix

CFG = get_config("tiny-test")
ACFG = AdapterConfig(levels=(1, 2), image_adapt_until=1, text_adapt_until=1)


def test_quantize_weight_roundtrip_error_bound():
    rng = np.random.default_rng(0)
    w = rng.standard_normal((64, 48)).astype(np.float32) * 0.05
    q, s = Q.quantize_weight(w)
    assert q.dtype == jnp.int8 and s.shape == (48,)
    err = np.abs(np.asarray(q, np.float32) * np.asarray(s) - w)
    # symmetric rounding: error <= half a quantization step per channel
    assert (err <= np.asarray(s) / 2 + 1e-8).all()
    # stacked [L, in, out] layout quantizes per (layer, channel)
    w3 = rng.standard_normal((3, 64, 48)).astype(np.float32)
    q3, s3 = Q.quantize_weight(w3)
    assert q3.shape == w3.shape and s3.shape == (3, 48)
    np.testing.assert_allclose(np.asarray(s3[1]),
                               np.asarray(Q.quantize_weight(w3[1])[1]))


def test_dyn_quant_per_token():
    rng = np.random.default_rng(1)
    x = rng.standard_normal((5, 7, 32)).astype(np.float32) * 3.0
    q, m = Q.dyn_quant(x)
    assert q.dtype == jnp.int8 and m.shape == (5, 7, 1)
    np.testing.assert_allclose(np.asarray(q, np.float32) * np.asarray(m), x,
                               atol=float(np.asarray(m).max()) / 2 + 1e-8)
    # int8 range fully used: some token hits +/-127
    assert np.abs(np.asarray(q)).max() == 127


def test_qdot_matches_float_matmul():
    rng = np.random.default_rng(2)
    x = rng.standard_normal((33, 64)).astype(np.float32)
    w = rng.standard_normal((64, 48)).astype(np.float32) * 0.04
    wq, ws = Q.quantize_weight(w)
    y = np.asarray(Q.qdot(jnp.asarray(x), wq, ws))
    ref = x @ w
    # two int8 roundings: relative error ~1e-2 of the output scale
    scale = np.abs(ref).max()
    assert np.abs(y - ref).max() < 2e-2 * scale


def test_linear_and_attention_int8_branches():
    """layers.linear / layers.attention take the quantized path when the
    weight leaf is int8 and track the float output closely."""
    rng = np.random.default_rng(3)
    D, H = 64, 4
    x = jnp.asarray(rng.standard_normal((2, 9, D)).astype(np.float32))
    w = rng.standard_normal((D, D)).astype(np.float32) * 0.05
    b = rng.standard_normal((D,)).astype(np.float32) * 0.01
    ref = np.asarray(L.linear(x, {"w": jnp.asarray(w), "b": jnp.asarray(b)}))
    wq, ws = Q.quantize_weight(w)
    out = np.asarray(L.linear(x, {"w": wq, "w_s": ws, "b": jnp.asarray(b)}))
    assert np.abs(out - ref).max() < 2e-2 * np.abs(ref).max()

    p = {
        "w_qkv": rng.standard_normal((D, 3 * D)).astype(np.float32) * 0.05,
        "b_qkv": rng.standard_normal((3 * D,)).astype(np.float32) * 0.01,
        "w_out": rng.standard_normal((D, D)).astype(np.float32) * 0.05,
        "b_out": rng.standard_normal((D,)).astype(np.float32) * 0.01,
    }
    pj = {k: jnp.asarray(v) for k, v in p.items()}
    for vv in (False, True):
        ref = np.asarray(L.attention(x, pj, H, vv=vv))
        qp = dict(pj)
        qp["w_qkv"], qp["w_qkv_s"] = Q.quantize_weight(p["w_qkv"])
        qp["w_out"], qp["w_out_s"] = Q.quantize_weight(p["w_out"])
        out = np.asarray(L.attention(x, qp, H, vv=vv))
        assert np.abs(out - ref).max() < 3e-2 * np.abs(ref).max(), vv

    # the batch-coupled V-V form takes the same quantized path (it used to
    # consume raw int8 codes as floats — round-3 review finding)
    ref = np.asarray(L.attention_vv_batch(x, pj, H))
    out = np.asarray(L.attention_vv_batch(x, qp, H))
    assert np.abs(out - ref).max() < 3e-2 * np.abs(ref).max()


def test_quantize_block_weights_structure():
    clip = create_clip_params(CFG, seed=0)
    blocks = Q.quantize_block_weights(clip["visual"]["blocks"])
    for grp, names in (("attn", ("w_qkv", "w_out")),
                       ("mlp", ("w_fc", "w_proj"))):
        for n in names:
            assert blocks[grp][n].dtype == jnp.int8
            assert blocks[grp][n + "_s"].shape == (
                blocks[grp][n].shape[0], blocks[grp][n].shape[-1])
    # everything else untouched
    assert blocks["attn"]["b_qkv"].dtype != jnp.int8
    assert (blocks["ln_1"]["scale"].dtype
            == clip["visual"]["blocks"]["ln_1"]["scale"].dtype)


def test_quantize_block_weights_source_skips_bf16_rounding():
    """make_predict_fn quantizes AFTER cast_matmul_weights has already
    produced bf16 copies; passing the original tree as ``source`` must fit
    the int8 grid to the fp32 values — identical to quantizing the
    originals directly, not the double-rounded bf16 copies (round-3
    review finding)."""
    from aaclip_tpu.core.config import DtypePolicy
    from aaclip_tpu.core.params import cast_matmul_weights

    clip = create_clip_params(CFG, seed=0)
    orig = clip["visual"]["blocks"]
    cast = cast_matmul_weights(clip["visual"], DtypePolicy.int8())["blocks"]
    want = Q.quantize_block_weights(orig)
    got = Q.quantize_block_weights(cast, source=orig)
    for grp, names in (("attn", ("w_qkv", "w_out")),
                       ("mlp", ("w_fc", "w_proj"))):
        for n in names:
            np.testing.assert_array_equal(np.asarray(got[grp][n]),
                                          np.asarray(want[grp][n]))
            np.testing.assert_array_equal(np.asarray(got[grp][n + "_s"]),
                                          np.asarray(want[grp][n + "_s"]))
    # and the bf16 copies genuinely differ (the bug was observable)
    buggy = Q.quantize_block_weights(cast)
    assert any(
        not np.array_equal(np.asarray(buggy[g][n]), np.asarray(want[g][n]))
        for g, ns in (("attn", ("w_qkv", "w_out")),
                      ("mlp", ("w_fc", "w_proj"))) for n in ns)


def test_int8_predict_tracks_fp32_rankings():
    """Task-level gate, mirroring the bf16 fast path's: the int8 pixel
    maps must rank pixels like fp32 (AUROC within the same budget)."""
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
    p_int8 = make_predict_fn(clip, CFG, ACFG, policy=DtypePolicy.int8(),
                             uint8_inputs=True)
    pix_a, score_a = p_fp32(adapters["image"], jnp.asarray(f32), anchors, M)
    pix_b, score_b = p_int8(adapters["image"], jnp.asarray(u8), anchors, M)
    pix_a, pix_b = np.asarray(pix_a), np.asarray(pix_b)
    corr = np.corrcoef(pix_a.reshape(-1), pix_b.reshape(-1))[0, 1]
    assert corr > 0.999, corr
    labels = pix_a.reshape(-1) > np.quantile(pix_a, 0.9)
    a_fp32 = auroc(labels, pix_a.reshape(-1))
    a_int8 = auroc(labels, pix_b.reshape(-1))
    assert abs(a_fp32 - a_int8) < 0.002, (a_fp32, a_int8)
    np.testing.assert_allclose(np.asarray(score_b), np.asarray(score_a),
                               atol=5e-3)


def test_int8_data_parallel_matches_single_device():
    """int8 composes with data parallelism: the quantized trunk replicates
    generically and the dp-sharded eval is bit-identical per sample
    (quantization is deterministic)."""
    from aaclip_tpu.parallel import sharding as sh

    clip = create_clip_params(CFG, seed=0)
    adapters = init_adapter_params(jax.random.PRNGKey(1), CFG, ACFG)
    rng = np.random.default_rng(4)
    B, S = 8, 70
    images = rng.standard_normal((B, 3, S, S)).astype(np.float32)
    anchors = rng.standard_normal((CFG.embed_dim, 2)).astype(np.float32)
    anchors /= np.linalg.norm(anchors, axis=0, keepdims=True)
    M = jnp.asarray(fused_postproc_matrix(CFG.vision.grid, S, "Industrial"))

    single = make_predict_fn(clip, CFG, ACFG, policy=DtypePolicy.int8())
    pix0, score0 = single(adapters["image"], jnp.asarray(images),
                          jnp.asarray(anchors), M)
    mesh = sh.make_data_mesh()
    dp = make_predict_fn(clip, CFG, ACFG, policy=DtypePolicy.int8(),
                         mesh=mesh)
    pix1, score1 = dp(adapters["image"], sh.shard_batch(mesh, images),
                      jnp.asarray(anchors), M)
    np.testing.assert_allclose(np.asarray(pix1), np.asarray(pix0),
                               atol=2e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(score1), np.asarray(score0),
                               atol=1e-6, rtol=1e-5)


def test_int8_rejects_tp_and_pipeline():
    clip = create_clip_params(CFG, seed=0)
    from aaclip_tpu.parallel import tensor as tpar
    from aaclip_tpu.parallel.pipeline import make_pipeline_predict_fn

    mesh = tpar.make_mesh_2d(tp=2)
    with pytest.raises(ValueError, match="int8"):
        make_predict_fn(clip, CFG, ACFG, policy=DtypePolicy.int8(),
                        mesh=mesh)
    with pytest.raises(ValueError, match="int8"):
        make_pipeline_predict_fn(clip, CFG, ACFG, pp=2,
                                 policy=DtypePolicy.int8())


def test_mixed_prefix_int8_routing():
    """int8_until=1 on the 2-layer tower (round 5): block 0 must run the
    QUANTIZED weights, block 1 the float weights — pinned against a
    manual composition of the two run_block_range segments."""
    import dataclasses

    from aaclip_tpu.core.params import cast_matmul_weights
    from aaclip_tpu.models.layers import config_act
    from aaclip_tpu.models.vit import embed, run_block_range, slice_blocks

    clip = create_clip_params(CFG, seed=0)
    policy = DtypePolicy.int8()
    mixed_policy = dataclasses.replace(policy, int8_until=1)
    rng = np.random.default_rng(6)
    B, S = 4, 70
    images = jnp.asarray(
        rng.standard_normal((B, 3, S, S)).astype(np.float32))

    visual = cast_matmul_weights(clip["visual"], policy)
    q_full = Q.quantize_block_weights(visual["blocks"],
                                      source=clip["visual"]["blocks"])
    act = config_act(CFG, policy)
    heads = CFG.vision.heads

    # manual composition: quantized block 0, float block 1
    x = embed(visual, CFG, images, policy)
    x = run_block_range(x, slice_blocks(q_full, 0, 1), heads, act=act,
                        policy=policy)
    want = run_block_range(x, slice_blocks(visual["blocks"], 1, 2), heads,
                           act=act, policy=policy)

    # the mixed tree the predict path builds: quantized prefix + the
    # float SUFFIX only (keeping the prefix's float copies would waste
    # HBM on unreachable leaves)
    pm = dict(visual)
    pm["blocks_q"] = Q.quantize_block_weights(
        slice_blocks(visual["blocks"], 0, 1),
        source=slice_blocks(clip["visual"]["blocks"], 0, 1))
    pm["blocks"] = slice_blocks(visual["blocks"], 1, 2)
    from aaclip_tpu.models.vit import encode_image
    _, taps = encode_image(pm, CFG, images, out_layers=(2,),
                           policy=mixed_policy)
    # a FULL float stack next to blocks_q must be rejected (the offset
    # indexing assumes the suffix-only layout)
    bad = dict(pm)
    bad["blocks"] = visual["blocks"]
    with pytest.raises(ValueError, match="suffix"):
        encode_image(bad, CFG, images, out_layers=(2,),
                     policy=mixed_policy)
    np.testing.assert_allclose(np.asarray(taps[0]), np.asarray(want),
                               atol=1e-6, rtol=1e-6)
    # and it differs from BOTH the float and the full-int8 towers
    _, tf = encode_image(visual, CFG, images, out_layers=(2,),
                         policy=policy)
    pq = dict(visual)
    pq["blocks"] = q_full
    _, tq = encode_image(pq, CFG, images, out_layers=(2,), policy=policy)
    assert np.abs(np.asarray(taps[0]) - np.asarray(tf[0])).max() > 1e-5
    assert np.abs(np.asarray(taps[0]) - np.asarray(tq[0])).max() > 1e-5


def test_mixed_prefix_int8_predict_end_to_end():
    """make_predict_fn with int8_until: runs, finite, tracks the full-int8
    maps closely, and validates the range."""
    import dataclasses

    clip = create_clip_params(CFG, seed=0)
    adapters = init_adapter_params(jax.random.PRNGKey(1), CFG, ACFG)
    rng = np.random.default_rng(8)
    B, S = 4, 70
    images = rng.standard_normal((B, 3, S, S)).astype(np.float32)
    anchors = rng.standard_normal((CFG.embed_dim, 2)).astype(np.float32)
    anchors /= np.linalg.norm(anchors, axis=0, keepdims=True)
    M = jnp.asarray(fused_postproc_matrix(CFG.vision.grid, S, "Industrial"))

    mixed = make_predict_fn(
        clip, CFG, ACFG,
        policy=dataclasses.replace(DtypePolicy.int8(), int8_until=1))
    pix, score = mixed(adapters["image"], jnp.asarray(images),
                       jnp.asarray(anchors), M)
    assert np.isfinite(np.asarray(pix)).all()
    assert np.isfinite(np.asarray(score)).all()
    full = make_predict_fn(clip, CFG, ACFG, policy=DtypePolicy.int8())
    pixf, _ = full(adapters["image"], jnp.asarray(images),
                   jnp.asarray(anchors), M)
    corr = np.corrcoef(np.asarray(pix).reshape(-1),
                       np.asarray(pixf).reshape(-1))[0, 1]
    assert corr > 0.999, corr
    with pytest.raises(ValueError, match="out of range"):
        make_predict_fn(
            clip, CFG, ACFG,
            policy=dataclasses.replace(DtypePolicy.int8(), int8_until=9))
