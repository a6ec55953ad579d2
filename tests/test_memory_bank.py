"""Few-shot memory bank (eval/memory_bank.py).

Pins: the bank CONSTRUCTION reproduces the reference's dead helper
semantics (reference test.py:39-50 — per-level patch tokens of every
support image, flattened image-major); the nearest-neighbor scoring is
self-consistent (a support image scores ~0 against its own bank; chunking
is exact); and ``bank_weight=0`` reproduces the plain text-anchor
predictor bit-for-bit, so the fusion never perturbs the parity path.
"""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from aaclip_tpu.core.config import AdapterConfig, get_config
from aaclip_tpu.core.params import create_clip_params, init_adapter_params
from aaclip_tpu.eval import memory_bank as mb
from aaclip_tpu.eval.predict import make_predict_fn
from aaclip_tpu.ops.similarity import fused_postproc_matrix

CFG = get_config("tiny-test")
ACFG = AdapterConfig(levels=(1, 2), image_adapt_until=1, text_adapt_until=1)


@pytest.fixture(scope="module")
def setup():
    clip = create_clip_params(CFG, seed=0)
    adapter = init_adapter_params(jax.random.PRNGKey(1), CFG, ACFG)["image"]
    rng = np.random.default_rng(7)
    S = CFG.vision.image_size
    support = rng.standard_normal((3, 3, S, S)).astype(np.float32)
    test_imgs = rng.standard_normal((4, 3, S, S)).astype(np.float32)
    anchors = rng.standard_normal((CFG.embed_dim, 2)).astype(np.float32)
    anchors /= np.linalg.norm(anchors, axis=0, keepdims=True)
    M = np.asarray(fused_postproc_matrix(CFG.vision.grid, S, "Industrial"))
    feats_fn = mb.make_patch_features_fn(clip, CFG, ACFG)
    return clip, adapter, support, test_imgs, anchors, M, feats_fn


def test_collect_bank_reference_construction(setup):
    """Batched collection == the reference's bs=1 loop + concat
    (test.py:39-50): [n_levels, n_support * L, D], image-major."""
    _, adapter, support, *_rest, feats_fn = setup
    bank = mb.collect_bank(feats_fn, adapter, support, batch_size=2)
    n_levels = len(ACFG.levels)
    L = CFG.vision.grid ** 2
    D = CFG.embed_dim
    assert bank.shape == (n_levels, support.shape[0] * L, D)
    # bs=1 loop, concatenated per level — the reference construction
    rows = [feats_fn(adapter, jnp.asarray(support[i:i + 1]))[0]
            for i in range(support.shape[0])]
    want = jnp.concatenate(rows, axis=1).reshape(n_levels, -1, D)
    np.testing.assert_allclose(np.asarray(bank), np.asarray(want),
                               atol=1e-6, rtol=1e-6)


def test_bank_scores_self_support_is_zero(setup):
    """Every patch of a support image has itself in the bank -> max cos 1
    -> bank score ~0 at every level."""
    _, adapter, support, *_rest, feats_fn = setup
    bank = mb.collect_bank(feats_fn, adapter, support)
    seg, _ = feats_fn(adapter, jnp.asarray(support))
    scores = mb.bank_grid_scores(seg, bank)
    assert float(jnp.max(jnp.abs(scores))) < 1e-3


def test_bank_scores_chunking_exact(setup):
    """Chunked scan == whole-bank max (padding repeats a bank row, which
    can never raise the max)."""
    _, adapter, support, test_imgs, *_rest, feats_fn = setup
    bank = mb.collect_bank(feats_fn, adapter, support)
    seg, _ = feats_fn(adapter, jnp.asarray(test_imgs))
    whole = mb.bank_grid_scores(seg, bank, chunk=int(bank.shape[1]))
    chunked = mb.bank_grid_scores(seg, bank, chunk=7)
    np.testing.assert_allclose(np.asarray(chunked), np.asarray(whole),
                               atol=1e-6, rtol=1e-6)
    assert float(jnp.min(whole)) >= 0.0  # distances are nonnegative


def test_mb_predict_weight_zero_matches_plain(setup):
    """bank_weight=0 must reproduce make_predict_fn exactly — the fusion
    is strictly additive on top of the parity path."""
    clip, adapter, support, test_imgs, anchors, M, feats_fn = setup
    plain = make_predict_fn(clip, CFG, ACFG)
    pix0, s0 = plain(adapter, jnp.asarray(test_imgs), jnp.asarray(anchors),
                     jnp.asarray(M))
    mbp = mb.make_mb_predict_fn(clip, CFG, ACFG, bank_weight=0.0)
    bank = mb.collect_bank(mbp.features_fn, adapter, support)
    pix1, s1 = mbp(adapter, jnp.asarray(test_imgs), jnp.asarray(anchors),
                   jnp.asarray(M), bank)
    np.testing.assert_allclose(np.asarray(pix1), np.asarray(pix0),
                               atol=1e-6, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s0),
                               atol=1e-6, rtol=1e-6)


def test_mb_predict_fused_shapes_and_ranges(setup):
    """Fused predictor: shapes match the plain path; at weight 1 the image
    score is the rescaled bank max (in [0, 1])."""
    clip, adapter, support, test_imgs, anchors, M, _ = setup
    mbp = mb.make_mb_predict_fn(clip, CFG, ACFG, bank_weight=1.0)
    bank = mb.collect_bank(mbp.features_fn, adapter, support)
    pix, s = mbp(adapter, jnp.asarray(test_imgs), jnp.asarray(anchors),
                 jnp.asarray(M), bank)
    S = CFG.vision.image_size
    assert pix.shape == (test_imgs.shape[0], S, S)
    assert s.shape == (test_imgs.shape[0],)
    assert float(jnp.min(s)) >= 0.0 and float(jnp.max(s)) <= 1.0
    with pytest.raises(ValueError, match="bank_weight"):
        mb.make_mb_predict_fn(clip, CFG, ACFG, bank_weight=1.5)


def test_mb_predict_data_parallel_matches_single_device(setup):
    """mesh=1-D data mesh (round 5): bank construction replicates, the
    fused predictor shards the batch — maps/scores must equal the
    single-device memory-bank path (both paths are per-sample separable;
    GSPMD only moves the batch axis)."""
    from aaclip_tpu.parallel import sharding as sh

    clip, adapter, support, test_imgs, anchors, M, _ = setup
    test_imgs = np.concatenate([test_imgs, test_imgs[::-1]])  # batch 8
    single = mb.make_mb_predict_fn(clip, CFG, ACFG, bank_weight=0.5)
    bank0 = mb.collect_bank(single.features_fn, adapter, support)
    pix0, s0 = single(adapter, jnp.asarray(test_imgs),
                      jnp.asarray(anchors), jnp.asarray(M), bank0)

    mesh = sh.make_data_mesh()
    assert mesh.devices.size == 8
    dp = mb.make_mb_predict_fn(clip, CFG, ACFG, bank_weight=0.5, mesh=mesh)
    bank1 = mb.collect_bank(dp.features_fn, adapter, support)
    # the replicated build hands the dp jit an already-replicated bank
    assert len(bank1.sharding.device_set) == 8
    pix1, s1 = dp(adapter, jnp.asarray(test_imgs), jnp.asarray(anchors),
                  jnp.asarray(M), bank1)
    np.testing.assert_allclose(np.asarray(pix1), np.asarray(pix0),
                               atol=2e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s0),
                               atol=1e-6, rtol=1e-5)
    with pytest.raises(ValueError, match="not divisible"):
        dp(adapter, jnp.asarray(test_imgs[:3]), jnp.asarray(anchors),
           jnp.asarray(M), bank1)


def test_mb_predict_rejects_tp_mesh():
    from aaclip_tpu.parallel import tensor as tpar

    clip = create_clip_params(CFG, seed=0)
    with pytest.raises(ValueError, match="1-D"):
        mb.make_mb_predict_fn(clip, CFG, ACFG,
                              mesh=tpar.make_mesh_2d(2))


def test_support_records():
    from aaclip_tpu.data.datasets import Record
    recs = [Record("a.png", 1, "bottle"), Record("b.png", 0, "bottle"),
            Record("c.png", 0, "bottle"), Record("d.png", 0, "bottle")]
    got = mb.support_records(recs, 2)
    assert [r.image_path for r in got] == ["b.png", "c.png"]
    with pytest.raises(ValueError, match="no normal"):
        mb.support_records([Record("a.png", 1, "bottle")], 2)
