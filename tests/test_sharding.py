"""Data-parallel correctness on the 8-device virtual CPU mesh: sharded
training steps must produce the same result as single-device execution,
and the dryrun entry must run."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from aaclip_tpu.core.config import AdapterConfig, get_config
from aaclip_tpu.core.params import create_clip_params, init_adapter_params
from aaclip_tpu.parallel import sharding as sh
from aaclip_tpu.train.optim import make_image_optimizer
from aaclip_tpu.train.steps import init_state, make_stage2_step

CFG = get_config("tiny-test")
ACFG = AdapterConfig(levels=(1, 2), image_adapt_until=1, text_adapt_until=1)


@pytest.fixture(scope="module")
def setup():
    assert len(jax.devices()) == 8, jax.devices()
    clip = create_clip_params(CFG, seed=0)
    adapters = init_adapter_params(jax.random.PRNGKey(1), CFG, ACFG)
    rng = np.random.default_rng(2)
    B, S = 8, CFG.vision.image_size
    batch = dict(
        images=rng.standard_normal((B, 3, S, S)).astype(np.float32),
        mask=(rng.random((B, S, S)) > 0.8).astype(np.float32),
        label=(np.arange(B) % 2).astype(np.int32),
        class_idx=(np.arange(B) % 2).astype(np.int32),
        valid=np.ones((B,), np.float32),
    )
    table = rng.standard_normal((2, CFG.embed_dim, 2)).astype(np.float32)
    table /= np.linalg.norm(table, axis=1, keepdims=True)
    return clip, adapters, batch, table


def test_sharded_step_matches_single_device(setup):
    clip, adapters, batch, table = setup
    tx = make_image_optimizer(lr=1e-3)
    step = make_stage2_step(clip, CFG, ACFG, tx, table)

    # single device
    s0 = init_state(adapters["image"], tx)
    s0, loss0 = step(s0, *(jnp.asarray(v) for v in batch.values()))

    # 8-device data parallel
    mesh = sh.make_data_mesh(8)
    clip_r = sh.replicate_tree(mesh, clip)
    step_dp = make_stage2_step(clip_r, CFG, ACFG, tx, table)
    sharded = sh.shard_batch(mesh, *batch.values())
    s1 = init_state(sh.replicate_tree(mesh, adapters["image"]), tx)
    s1, loss1 = step_dp(s1, *sharded)

    np.testing.assert_allclose(float(loss0), float(loss1), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(s0.params), jax.tree.leaves(s1.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-6, rtol=1e-5)


def test_stage1_batch_vv_features_sharded_match_single_device(setup):
    """The reference's batch-coupled V-V supervision (vv_mode='batch', the
    stage-1 default — docs/PARITY.md) under data parallelism: the batch-axis
    softmax spans devices, so XLA must insert cross-device collectives, and
    the sharded features must still reproduce single-device execution (the
    reference's single-GPU semantics)."""
    from aaclip_tpu.train.steps import stage1_features_fn

    clip, _, batch, _ = setup
    feats_fn = stage1_features_fn(clip, CFG, surgery_until_layer=2)
    want = np.asarray(feats_fn(jnp.asarray(batch["images"])))
    mesh = sh.make_data_mesh(8)
    got = np.asarray(feats_fn(sh.shard_batch(mesh, batch["images"])))
    np.testing.assert_allclose(got, want, atol=2e-6)


def test_pad_batch_to_devices():
    arrays = [np.arange(6, dtype=np.float32).reshape(6, 1)]
    valid = np.ones((6,), np.float32)
    out, v = sh.pad_batch_to_devices(arrays, valid, 4)
    assert out[0].shape == (8, 1)
    np.testing.assert_array_equal(v, [1, 1, 1, 1, 1, 1, 0, 0])


def test_dryrun_multichip_entry():
    import __graft_entry__ as g
    g.dryrun_multichip(8)


def test_sharded_eval_matches_single_device(setup):
    """Data-parallel predict (mesh path of make_predict_fn) must reproduce
    the single-device pixel maps and image scores. Per-sample work is
    independent, but the per-shard batch shape selects different XLA kernel
    variants, so agreement is to float noise rather than bit-exact."""
    from aaclip_tpu.eval.predict import make_predict_fn
    from aaclip_tpu.ops.similarity import fused_postproc_matrix

    clip, adapters, batch, table = setup
    S = CFG.vision.image_size
    anchors = jnp.asarray(table[0])
    M = jnp.asarray(fused_postproc_matrix(CFG.vision.grid, S, "Industrial"))
    images = jnp.asarray(batch["images"])

    single = make_predict_fn(clip, CFG, ACFG)
    pix0, score0 = single(adapters["image"], images, anchors, M)

    mesh = sh.make_data_mesh(8)
    dp = make_predict_fn(clip, CFG, ACFG, mesh=mesh)
    pix1, score1 = dp(adapters["image"], sh.shard_batch(mesh, batch["images"]),
                      anchors, M)

    np.testing.assert_allclose(np.asarray(pix0), np.asarray(pix1),
                               atol=2e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(score0), np.asarray(score1),
                               atol=1e-6, rtol=1e-5)


def test_run_class_predictions_mesh(tmp_path):
    """run_class_predictions with a mesh-carrying predict_fn: shards each
    loader batch, replicates adapters/anchors, trims padding."""
    from aaclip_tpu.eval.predict import make_predict_fn, run_class_predictions

    clip = create_clip_params(CFG, seed=0)
    adapters = init_adapter_params(jax.random.PRNGKey(1), CFG, ACFG)
    rng = np.random.default_rng(3)
    S = CFG.vision.image_size
    n = 11  # ragged: loader pads final batch to 8, n_valid trims it

    class _Loader:
        def __iter__(self):
            for start in range(0, n, 8):
                m = min(8, n - start)
                imgs = rng.standard_normal((8, 3, S, S)).astype(np.float32)
                yield dict(image=imgs,
                           mask=np.zeros((8, S, S), np.float32),
                           label=np.zeros((8,), np.int32),
                           file_name=[f"f{start + i}" for i in range(8)],
                           n_valid=m)

    anchors = rng.standard_normal((CFG.embed_dim, 2)).astype(np.float32)
    anchors /= np.linalg.norm(anchors, axis=0, keepdims=True)

    mesh = sh.make_data_mesh(8)
    dp = make_predict_fn(clip, CFG, ACFG, mesh=mesh)
    masks, labels, pix, img, files = run_class_predictions(
        dp, adapters["image"], _Loader(), anchors, "Industrial",
        S, CFG.vision.grid)
    assert pix.shape == (n, S, S)
    assert img.shape == (n,)
    assert len(files) == n
