"""Tensor-parallel correctness on the 8-device virtual CPU mesh.

The Megatron-style trunk sharding (parallel/tensor.py) must reproduce the
single-device eval path exactly up to fp reassociation: same maps, same
scores, for every (dp, tp) factorization of the mesh, with and without the
staged-precision trunk.  The reference has no model parallelism at all
(SURVEY §2 — strictly single-GPU); these tests pin the TPU-native
extension's equality contract.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from aaclip_tpu.core.config import AdapterConfig, DtypePolicy, get_config
from aaclip_tpu.core.params import create_clip_params, init_adapter_params
from aaclip_tpu.eval.predict import make_predict_fn
from aaclip_tpu.models import layers as L
from aaclip_tpu.ops.similarity import fused_postproc_matrix
from aaclip_tpu.parallel import sharding as sh
from aaclip_tpu.parallel import tensor as tpar

CFG = get_config("tiny-test")
ACFG = AdapterConfig(levels=(1, 2), image_adapt_until=1, text_adapt_until=1)


@pytest.fixture(scope="module")
def setup():
    assert len(jax.devices()) == 8, jax.devices()
    clip = create_clip_params(CFG, seed=0)
    adapters = init_adapter_params(jax.random.PRNGKey(1), CFG, ACFG)
    rng = np.random.default_rng(3)
    B, S = 8, CFG.vision.image_size
    images = rng.standard_normal((B, 3, S, S)).astype(np.float32)
    anchors = rng.standard_normal((CFG.embed_dim, 2)).astype(np.float32)
    anchors /= np.linalg.norm(anchors, axis=0, keepdims=True)
    M = np.asarray(fused_postproc_matrix(CFG.vision.grid, S, "Industrial"))
    return clip, adapters["image"], images, anchors, M


def test_repacked_attention_matches_packed(setup):
    """make_tp_attn_fn on head-major weights == layers.attention on the
    original packing (the permutation is semantics-preserving)."""
    clip, *_ = setup
    blk = jax.tree.map(lambda a: a[0], clip["visual"]["blocks"])
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((4, 9, CFG.vision.width)), jnp.float32)
    want = L.attention(x, blk["attn"], CFG.vision.heads)
    mesh = tpar.make_mesh_2d(tp=2)
    w, b = tpar.repack_qkv_head_major(
        blk["attn"]["w_qkv"], blk["attn"]["b_qkv"], CFG.vision.heads)
    p_hm = dict(blk["attn"], w_qkv=w, b_qkv=b)
    got = tpar.make_tp_attn_fn(CFG.vision.heads, mesh, DtypePolicy())(x, p_hm)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize("tp", [2, 4])
def test_tp_eval_matches_single_device(setup, tp):
    clip, image_adapter, images, anchors, M = setup
    single = make_predict_fn(clip, CFG, ACFG)
    pix0, score0 = single(image_adapter, jnp.asarray(images),
                          jnp.asarray(anchors), jnp.asarray(M))

    mesh = tpar.make_mesh_2d(tp=tp)
    assert dict(mesh.shape) == {"data": 8 // tp, "model": tp}
    tp_fn = make_predict_fn(clip, CFG, ACFG, mesh=mesh)
    pix1, score1 = tp_fn(image_adapter, sh.shard_batch(mesh, images),
                         jnp.asarray(anchors), jnp.asarray(M))
    np.testing.assert_allclose(np.asarray(pix1), np.asarray(pix0),
                               atol=2e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(score1), np.asarray(score0),
                               atol=1e-6, rtol=1e-5)


def test_tp_eval_staged_policy_matches_single_device(setup):
    """TP under the staged-precision trunk (fp32_high-style bf16 prefix):
    both sides staged, sharded == single-device within bf16 tolerance."""
    clip, image_adapter, images, anchors, M = setup
    policy = DtypePolicy(bf16_until=1)
    single = make_predict_fn(clip, CFG, ACFG, policy=policy)
    pix0, score0 = single(image_adapter, jnp.asarray(images),
                          jnp.asarray(anchors), jnp.asarray(M))
    mesh = tpar.make_mesh_2d(tp=2)
    tp_fn = make_predict_fn(clip, CFG, ACFG, policy=policy, mesh=mesh)
    pix1, score1 = tp_fn(image_adapter, sh.shard_batch(mesh, images),
                         jnp.asarray(anchors), jnp.asarray(M))
    # the bf16 prefix matmul partitioning differs between the two paths, so
    # equality is up to bf16 reassociation, not exact
    np.testing.assert_allclose(np.asarray(pix1), np.asarray(pix0),
                               atol=5e-2, rtol=5e-2)
    np.testing.assert_allclose(np.asarray(score1), np.asarray(score0),
                               atol=1e-2, rtol=1e-2)


def test_tp_mesh_validation():
    with pytest.raises(ValueError, match="must divide device count"):
        tpar.make_mesh_2d(tp=3)
    mesh = tpar.make_mesh_2d(tp=8)  # tiny-test has 4 heads: 8 can't divide
    with pytest.raises(ValueError, match="must divide head count"):
        tpar.shard_visual(create_clip_params(CFG, seed=0)["visual"], CFG, mesh)


def test_tp_rejects_fused_block_fn(setup):
    clip, *_ = setup
    mesh = tpar.make_mesh_2d(tp=2)
    with pytest.raises(ValueError, match="mutually exclusive"):
        make_predict_fn(clip, CFG, ACFG, mesh=mesh,
                        block_fn=lambda x, p: x)


@pytest.mark.parametrize("remat", [True, "selective"])
def test_tp_stage2_step_matches_single_device(setup, remat):
    """One full stage-2 update (forward, 4-level losses, grads THROUGH the
    Megatron-sharded trunk, Adam) on the (data=4, model=2) mesh must
    reproduce the single-device loss and updated adapter params."""
    from aaclip_tpu.train.optim import make_image_optimizer
    from aaclip_tpu.train.steps import init_state, make_stage2_step

    clip, image_adapter, images, anchors, M = setup
    B, S = images.shape[0], CFG.vision.image_size
    rng = np.random.default_rng(7)
    mask = (rng.random((B, S, S)) > 0.8).astype(np.float32)
    label = (np.arange(B) % 2).astype(np.int32)
    class_idx = (np.arange(B) % 2).astype(np.int32)
    valid = np.ones((B,), np.float32)
    table = np.stack([anchors, anchors[:, ::-1]]).astype(np.float32)

    tx = make_image_optimizer(1e-3)
    s0 = make_stage2_step(clip, CFG, ACFG, tx, table, remat=remat)
    st0, l0 = s0(init_state(image_adapter, tx), jnp.asarray(images),
                 jnp.asarray(mask), jnp.asarray(label),
                 jnp.asarray(class_idx), jnp.asarray(valid))

    mesh = tpar.make_mesh_2d(tp=2)
    s1 = make_stage2_step(clip, CFG, ACFG, tx, table, remat=remat, mesh=mesh)
    imgs_s, mask_s, label_s, cidx_s, valid_s = sh.shard_batch(
        mesh, images, mask, label, class_idx, valid)
    st1, l1 = s1(init_state(image_adapter, tx), imgs_s, mask_s, label_s,
                 cidx_s, valid_s)

    np.testing.assert_allclose(float(l1), float(l0), atol=1e-5, rtol=1e-5)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-5, rtol=1e-4),
        st1.params, st0.params)


def test_sp_eval_matches_single_device(setup):
    """Sequence parallelism (Megatron-SP) on the (data=4, model=2) mesh:
    residual stream sequence-sharded between matmul regions — results must
    equal single-device, and the partitioned program must carry the SP
    schedule (sequence all-gathers before the matmul regions; the
    post-matmul reductions keep only the local sequence shard — fused into
    reduce-scatter by the TPU backend's collective pass, visible as
    all-reduce + dynamic-slice on this CPU test backend)."""
    import re

    clip, image_adapter, images, anchors, M = setup
    single = make_predict_fn(clip, CFG, ACFG)
    pix0, score0 = single(image_adapter, jnp.asarray(images),
                          jnp.asarray(anchors), jnp.asarray(M))

    mesh = tpar.make_mesh_2d(tp=2)
    sp_fn = make_predict_fn(clip, CFG, ACFG, mesh=mesh,
                            sequence_parallel=True)
    pix1, score1 = sp_fn(image_adapter, sh.shard_batch(mesh, images),
                         jnp.asarray(anchors), jnp.asarray(M))
    np.testing.assert_allclose(np.asarray(pix1), np.asarray(pix0),
                               atol=2e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(score1), np.asarray(score0),
                               atol=1e-6, rtol=1e-5)

    txt = sp_fn.raw.lower(sp_fn.visual, image_adapter,
                          sh.shard_batch(mesh, images), jnp.asarray(anchors),
                          jnp.asarray(M)).compile().as_text()
    assert re.search(r"all-gather", txt), "SP must gather sequence shards"
    # block elementwise work runs on the sequence shard: ceil(S/2) tokens
    S = CFG.vision.grid ** 2 + 1
    shard_tokens = -(-S // 2)
    assert re.search(rf"f32\[2,{shard_tokens},{CFG.vision.width}\]", txt), (
        "residual-stream ops should compute on the per-device sequence "
        "shard")


@pytest.mark.parametrize("remat", [True, "selective"])
def test_sp_stage2_step_matches_single_device(setup, remat):
    """Stage-2 update with sequence parallelism == single-device (loss and
    updated adapter params), under both remat modes."""
    from aaclip_tpu.train.optim import make_image_optimizer
    from aaclip_tpu.train.steps import init_state, make_stage2_step

    clip, image_adapter, images, anchors, M = setup
    B, S = images.shape[0], CFG.vision.image_size
    rng = np.random.default_rng(11)
    mask = (rng.random((B, S, S)) > 0.8).astype(np.float32)
    label = (np.arange(B) % 2).astype(np.int32)
    class_idx = (np.arange(B) % 2).astype(np.int32)
    valid = np.ones((B,), np.float32)
    table = np.stack([anchors, anchors[:, ::-1]]).astype(np.float32)

    tx = make_image_optimizer(1e-3)
    s0 = make_stage2_step(clip, CFG, ACFG, tx, table, remat=remat)
    st0, l0 = s0(init_state(image_adapter, tx), jnp.asarray(images),
                 jnp.asarray(mask), jnp.asarray(label),
                 jnp.asarray(class_idx), jnp.asarray(valid))

    mesh = tpar.make_mesh_2d(tp=2)
    s1 = make_stage2_step(clip, CFG, ACFG, tx, table, remat=remat,
                          mesh=mesh, sequence_parallel=True)
    batch = sh.shard_batch(mesh, images, mask, label, class_idx, valid)
    st1, l1 = s1(init_state(image_adapter, tx), *batch)

    np.testing.assert_allclose(float(l1), float(l0), atol=1e-5, rtol=1e-5)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-5, rtol=1e-4),
        st1.params, st0.params)


def test_tp_stage2_grad_accum_composes(setup):
    """--tensor_parallel + --grad_accum together: the microbatch scan runs
    inside the GSPMD-sharded step and still reproduces the single-device
    grad_accum update."""
    from aaclip_tpu.train.optim import make_image_optimizer
    from aaclip_tpu.train.steps import init_state, make_stage2_step

    clip, image_adapter, images, anchors, M = setup
    B, S = images.shape[0], CFG.vision.image_size
    rng = np.random.default_rng(13)
    mask = (rng.random((B, S, S)) > 0.8).astype(np.float32)
    label = (np.arange(B) % 2).astype(np.int32)
    class_idx = (np.arange(B) % 2).astype(np.int32)
    valid = np.ones((B,), np.float32)
    table = np.stack([anchors, anchors[:, ::-1]]).astype(np.float32)

    tx = make_image_optimizer(1e-3)
    s0 = make_stage2_step(clip, CFG, ACFG, tx, table, grad_accum=2)
    st0, l0 = s0(init_state(image_adapter, tx), jnp.asarray(images),
                 jnp.asarray(mask), jnp.asarray(label),
                 jnp.asarray(class_idx), jnp.asarray(valid))

    mesh = tpar.make_mesh_2d(tp=2)
    s1 = make_stage2_step(clip, CFG, ACFG, tx, table, mesh=mesh,
                          sequence_parallel=True, grad_accum=2)
    batch = sh.shard_batch(mesh, images, mask, label, class_idx, valid)
    st1, l1 = s1(init_state(image_adapter, tx), *batch)

    np.testing.assert_allclose(float(l1), float(l0), atol=1e-5, rtol=1e-5)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-5, rtol=1e-4),
        st1.params, st0.params)


def test_tp_causal_attention_matches_masked(setup):
    """make_tp_attn_fn(causal=True) on head-major weights == the standard
    attention with an explicit causal mask (the text-tower contract)."""
    clip, *_ = setup
    blk = jax.tree.map(lambda a: a[0], clip["text"]["blocks"])
    rng = np.random.default_rng(21)
    x = jnp.asarray(rng.standard_normal((4, 11, CFG.text.width)), jnp.float32)
    want = L.attention(x, blk["attn"], CFG.text.heads,
                       mask=L.causal_mask(11))
    mesh = tpar.make_mesh_2d(tp=2)
    w, b = tpar.repack_qkv_head_major(
        blk["attn"]["w_qkv"], blk["attn"]["b_qkv"], CFG.text.heads)
    p_hm = dict(blk["attn"], w_qkv=w, b_qkv=b)
    fn = tpar.make_tp_attn_fn(CFG.text.heads, mesh, DtypePolicy(),
                              causal=True)
    assert fn.causal
    got = fn(x, p_hm)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)


def test_text_trunk_rejects_uncausal_attn_fn(setup):
    """A text-tower attn_fn override that does not advertise causality must
    be rejected (it would silently compute non-causal attention)."""
    from aaclip_tpu.models.text_model import encode_text
    clip, *_ = setup
    tokens = jnp.zeros((2, 7), jnp.int32)
    mesh = tpar.make_mesh_2d(tp=2)
    fn = tpar.make_tp_attn_fn(CFG.text.heads, mesh, DtypePolicy())  # causal=False
    from aaclip_tpu.models.text_model import _trunk
    with pytest.raises(ValueError, match="causal"):
        _trunk(clip["text"], CFG, tokens, attn_fn=fn)
    del encode_text


@pytest.mark.parametrize("vv_mode", ["batch", "spatial"])
def test_tp_stage1_features_match_single_device(setup, vv_mode):
    """Stage-1 surgery features through the TP-sharded trunk (both V-V
    layouts, including the reference's batch-coupled quirk) == the
    single-device features."""
    from aaclip_tpu.train.steps import stage1_features_fn

    clip, _, images, *_ = setup
    ref = stage1_features_fn(clip, CFG, surgery_until_layer=2,
                             vv_mode=vv_mode)(jnp.asarray(images))
    mesh = tpar.make_mesh_2d(tp=2)
    got = stage1_features_fn(clip, CFG, surgery_until_layer=2,
                             vv_mode=vv_mode, mesh=mesh)(
        sh.shard_batch(mesh, images))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-5, rtol=1e-4)


def test_tp_stage1_features_masked_tail_batch(setup):
    """Padded final batch under TP: the batch-coupled V-V softmax must see
    only the valid rows (reference runs the smaller unpadded tail batch),
    exactly like the single-device masked path."""
    from aaclip_tpu.train.steps import stage1_features_fn

    clip, _, images, *_ = setup
    valid = np.array([1, 1, 1, 1, 1, 0, 0, 0], np.float32)
    ref = stage1_features_fn(clip, CFG, surgery_until_layer=2)(
        jnp.asarray(images), jnp.asarray(valid))
    mesh = tpar.make_mesh_2d(tp=2)
    imgs_s, valid_s = sh.shard_batch(mesh, images, valid)
    got = stage1_features_fn(clip, CFG, surgery_until_layer=2,
                             mesh=mesh)(imgs_s, valid_s)
    n = int(valid.sum())
    np.testing.assert_allclose(np.asarray(got)[:n], np.asarray(ref)[:n],
                               atol=2e-5, rtol=1e-4)


@pytest.mark.parametrize("sp", [False, True])
def test_tp_stage1_step_matches_single_device(setup, sp):
    """One full stage-1 update (prompt encode through the Megatron-sharded
    TEXT tower, seg+orthogonality losses, grads, Adam) on the
    (data=4, model=2) mesh must reproduce the single-device loss and
    updated text-adapter params — with and without Megatron-SP on the
    token stream."""
    from aaclip_tpu.core.params import init_adapter_params
    from aaclip_tpu.text.anchors import dataset_prompt_tokens
    from aaclip_tpu.train.optim import make_text_optimizer
    from aaclip_tpu.train.steps import (init_state, make_stage1_step,
                                        stage1_features_fn)

    clip, _, images, *_ = setup
    text_adapter = init_adapter_params(jax.random.PRNGKey(5), CFG,
                                       ACFG)["text"]
    feats = stage1_features_fn(clip, CFG, surgery_until_layer=2)(
        jnp.asarray(images))
    B, S = images.shape[0], CFG.vision.image_size
    rng = np.random.default_rng(17)
    mask = (rng.random((B, S, S)) > 0.8).astype(np.float32)
    class_idx = (np.arange(B) % 2).astype(np.int32)
    valid = np.ones((B,), np.float32)
    tokens = dataset_prompt_tokens("MVTec", ["bottle", "cable"])

    tx0 = make_text_optimizer(1e-3)
    s0 = make_stage1_step(clip, CFG, ACFG, tx0, tokens)
    st0, l0 = s0(init_state(text_adapter, tx0), feats, jnp.asarray(mask),
                 jnp.asarray(class_idx), jnp.asarray(valid))

    mesh = tpar.make_mesh_2d(tp=2)
    tx1 = make_text_optimizer(1e-3)
    s1 = make_stage1_step(clip, CFG, ACFG, tx1, tokens, mesh=mesh,
                          sequence_parallel=sp)
    batch = sh.shard_batch(mesh, np.asarray(feats), mask, class_idx, valid)
    st1, l1 = s1(init_state(text_adapter, tx1), *batch)

    np.testing.assert_allclose(float(l1), float(l0), atol=1e-5, rtol=1e-5)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-5, rtol=1e-4),
        st1.params, st0.params)


def test_stage1_sp_requires_tp_mesh(setup):
    from aaclip_tpu.text.anchors import dataset_prompt_tokens
    from aaclip_tpu.train.optim import make_text_optimizer
    from aaclip_tpu.train.steps import make_stage1_step, stage1_features_fn

    clip, *_ = setup
    with pytest.raises(ValueError, match="sequence_parallel requires"):
        stage1_features_fn(clip, CFG, surgery_until_layer=2,
                           sequence_parallel=True)
    tokens = dataset_prompt_tokens("MVTec", ["bottle"])
    with pytest.raises(ValueError, match="sequence_parallel requires"):
        make_stage1_step(clip, CFG, ACFG, make_text_optimizer(1e-3), tokens,
                         mesh=sh.make_data_mesh(8), sequence_parallel=True)


def test_sp_requires_tp_mesh(setup):
    clip, *_ = setup
    with pytest.raises(ValueError, match="sequence_parallel requires"):
        make_predict_fn(clip, CFG, ACFG, sequence_parallel=True)
    from aaclip_tpu.train.optim import make_image_optimizer
    from aaclip_tpu.train.steps import make_stage2_step

    anchors = np.zeros((2, CFG.embed_dim, 2), np.float32)
    with pytest.raises(ValueError, match="sequence_parallel requires"):
        make_stage2_step(clip, CFG, ACFG, make_image_optimizer(1e-3),
                         anchors, mesh=sh.make_data_mesh(8),
                         sequence_parallel=True)


def test_tp_rejects_unknown_block_leaves(setup):
    """int8-style extra leaves in the block tree must fail with a named
    error at spec building, not device_put's opaque pytree mismatch."""
    clip, *_ = setup
    visual = jax.tree.map(lambda x: x, clip["visual"])
    visual["blocks"] = dict(visual["blocks"])
    visual["blocks"]["attn"] = dict(visual["blocks"]["attn"],
                                    w_qkv_s=np.ones((2, 1), np.float32))
    with pytest.raises(ValueError, match="does not recognize"):
        tpar.visual_partition_specs(visual)


def test_dp_only_mesh_unaffected():
    """A 1-D ('data',) mesh must keep the replicated-params DP path (no
    repack, no TP closures)."""
    mesh = sh.make_data_mesh(8)
    assert not tpar.is_tp_mesh(mesh)
    assert tpar.is_tp_mesh(tpar.make_mesh_2d(tp=2))
    assert not tpar.is_tp_mesh(tpar.make_mesh_2d(tp=1))
