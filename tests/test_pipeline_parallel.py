"""Pipeline-parallel (GPipe over the level-aligned trunk) correctness on
the virtual CPU mesh.

make_pipeline_predict_fn must reproduce the single-device eval path for
every (pp, n_micro) the level structure admits; the reference is strictly
single-GPU (SURVEY §2), so like the rest of parallel/ this pins the
TPU-native extension's equality contract.
"""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from aaclip_tpu.core.config import AdapterConfig, DtypePolicy, get_config
from aaclip_tpu.core.params import create_clip_params, init_adapter_params
from aaclip_tpu.eval.predict import make_predict_fn
from aaclip_tpu.ops.similarity import fused_postproc_matrix
from aaclip_tpu.parallel import pipeline as ppl

CFG = get_config("tiny-test")
ACFG = AdapterConfig(levels=(1, 2), image_adapt_until=1, text_adapt_until=1)


def _setup(cfg, acfg, batch, seed=3):
    clip = create_clip_params(cfg, seed=0)
    adapters = init_adapter_params(jax.random.PRNGKey(1), cfg, acfg)
    rng = np.random.default_rng(seed)
    S = cfg.vision.image_size
    images = rng.standard_normal((batch, 3, S, S)).astype(np.float32)
    anchors = rng.standard_normal((cfg.embed_dim, 2)).astype(np.float32)
    anchors /= np.linalg.norm(anchors, axis=0, keepdims=True)
    M = np.asarray(fused_postproc_matrix(cfg.vision.grid, S, "Industrial"))
    return clip, adapters["image"], images, anchors, M


@pytest.mark.parametrize("n_micro", [2, 4])
def test_pp_eval_matches_single_device(n_micro):
    assert len(jax.devices()) == 8
    clip, image_adapter, images, anchors, M = _setup(CFG, ACFG, batch=8)
    single = make_predict_fn(clip, CFG, ACFG)
    pix0, score0 = single(image_adapter, jnp.asarray(images),
                          jnp.asarray(anchors), jnp.asarray(M))

    pp_fn = ppl.make_pipeline_predict_fn(clip, CFG, ACFG, pp=2,
                                         n_micro=n_micro)
    pix1, score1 = pp_fn(image_adapter, images, anchors, M)
    np.testing.assert_allclose(np.asarray(pix1), np.asarray(pix0),
                               atol=2e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(score1), np.asarray(score0),
                               atol=1e-6, rtol=1e-5)


def test_pp4_four_stage_four_level_tower():
    """A 4-layer tower with levels (1,2,3,4) pipelines over 4 stages (one
    block per stage, every stage output a tap)."""
    cfg = dataclasses.replace(
        CFG, vision=dataclasses.replace(CFG.vision, layers=4))
    acfg = AdapterConfig(levels=(1, 2, 3, 4), image_adapt_until=2,
                         text_adapt_until=1)
    clip, image_adapter, images, anchors, M = _setup(cfg, acfg, batch=4)
    single = make_predict_fn(clip, cfg, acfg)
    pix0, score0 = single(image_adapter, jnp.asarray(images),
                          jnp.asarray(anchors), jnp.asarray(M))
    pp_fn = ppl.make_pipeline_predict_fn(clip, cfg, acfg, pp=4, n_micro=2)
    pix1, score1 = pp_fn(image_adapter, images, anchors, M)
    np.testing.assert_allclose(np.asarray(pix1), np.asarray(pix0),
                               atol=2e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(score1), np.asarray(score0),
                               atol=1e-6, rtol=1e-5)


def test_pp_per_sample_anchors():
    """Mixed-class batches (per-sample [B, D, 2] anchors — the serving
    layout) flow through the microbatch slicing."""
    clip, image_adapter, images, anchors, M = _setup(CFG, ACFG, batch=4)
    rng = np.random.default_rng(9)
    banchors = rng.standard_normal((4, CFG.embed_dim, 2)).astype(np.float32)
    banchors /= np.linalg.norm(banchors, axis=1, keepdims=True)
    single = make_predict_fn(clip, CFG, ACFG)
    pix0, score0 = single(image_adapter, jnp.asarray(images),
                          jnp.asarray(banchors), jnp.asarray(M))
    pp_fn = ppl.make_pipeline_predict_fn(clip, CFG, ACFG, pp=2, n_micro=2)
    pix1, score1 = pp_fn(image_adapter, images, banchors, M)
    np.testing.assert_allclose(np.asarray(pix1), np.asarray(pix0),
                               atol=2e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(score1), np.asarray(score0),
                               atol=1e-6, rtol=1e-5)


def test_pp_dp_composition():
    """pp=2 x dp=4 on the 8-device ('stage','data') mesh: each pipeline
    replica processes a batch shard of every microbatch; shared AND
    per-sample anchors must reproduce single-device."""
    clip, image_adapter, images, anchors, M = _setup(CFG, ACFG, batch=8)
    single = make_predict_fn(clip, CFG, ACFG)
    pix0, score0 = single(image_adapter, jnp.asarray(images),
                          jnp.asarray(anchors), jnp.asarray(M))
    fn = ppl.make_pipeline_predict_fn(clip, CFG, ACFG, pp=2, n_micro=2,
                                      dp=4)
    pix1, score1 = fn(image_adapter, images, anchors, M)
    np.testing.assert_allclose(np.asarray(pix1), np.asarray(pix0),
                               atol=2e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(score1), np.asarray(score0),
                               atol=1e-6, rtol=1e-5)

    rng = np.random.default_rng(11)
    ban = rng.standard_normal((8, CFG.embed_dim, 2)).astype(np.float32)
    ban /= np.linalg.norm(ban, axis=1, keepdims=True)
    pix0b, score0b = single(image_adapter, jnp.asarray(images),
                            jnp.asarray(ban), jnp.asarray(M))
    pix1b, score1b = fn(image_adapter, images, ban, M)
    np.testing.assert_allclose(np.asarray(pix1b), np.asarray(pix0b),
                               atol=2e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(score1b), np.asarray(score0b),
                               atol=1e-6, rtol=1e-5)
    with pytest.raises(ValueError, match="dp=4"):
        fn(image_adapter, images[:6], anchors, M)
    with pytest.raises(ValueError, match="pp\\*dp"):
        ppl.make_pp_mesh(2, 5)


def test_pp_blocks_stage_sharded_at_build():
    """The frozen trunk is placed ONCE at build time, sharded over the
    stage axis: every device holds exactly layers/pp blocks (the memory
    benefit pipeline parallelism advertises), never the full tree."""
    clip = create_clip_params(CFG, seed=0)
    fn = ppl.make_pipeline_predict_fn(clip, CFG, ACFG, pp=2, n_micro=2)
    for leaf in jax.tree.leaves(fn.blocks_staged):
        assert leaf.shape[0] == 2                        # [pp, L/pp, ...]
        # stage axis sharded: each shard's leading extent is 1 stage
        assert {s.data.shape[0] for s in leaf.addressable_shards} == {1}


def test_pp_eval_bf16_no_systematic_excess_error():
    """The bf16 fast path: the pipeline block body shares
    layers.norm_matched_blend, whose traced-weight branch casts the blend
    coefficients to the stream dtype — a traced f32 weight would otherwise
    promote the blend to f32 and round differently from the single-device
    path, adding a SYSTEMATIC one-bf16-ulp-per-adapted-block bias on top
    of ordinary rounding noise.

    Bitwise bf16 equality across the two program structures is not
    attainable (XLA fuses/reassociates the shard_map and plain-jit
    programs differently, and every intermediate rounds to bf16), so the
    contract is: the pipeline's distance to the fp32 reference stays
    within the single-device bf16 path's own noise band — no extra bias."""
    clip, image_adapter, images, anchors, M = _setup(CFG, ACFG, batch=4)
    args = (image_adapter, jnp.asarray(images), jnp.asarray(anchors),
            jnp.asarray(M))
    pix_ref, score_ref = make_predict_fn(
        clip, CFG, ACFG, policy=DtypePolicy.from_name("fp32"))(*args)
    pix_b, score_b = make_predict_fn(
        clip, CFG, ACFG, policy=DtypePolicy.bf16())(*args)
    pp_fn = ppl.make_pipeline_predict_fn(clip, CFG, ACFG, pp=2, n_micro=2,
                                         policy=DtypePolicy.bf16())
    pix_p, score_p = pp_fn(image_adapter, images, anchors, M)

    band = np.abs(np.asarray(pix_b) - np.asarray(pix_ref)).max()
    excess = np.abs(np.asarray(pix_p) - np.asarray(pix_ref)).max()
    assert excess <= 1.5 * band + 1e-4, (excess, band)
    sband = np.abs(np.asarray(score_b) - np.asarray(score_ref)).max()
    sexcess = np.abs(np.asarray(score_p) - np.asarray(score_ref)).max()
    assert sexcess <= 1.5 * sband + 1e-5, (sexcess, sband)


def test_pp_mesh_stage_neighbours_adjacent():
    """Stage-adjacent devices must be neighbours in device order for every
    data replica (the per-tick ppermute hop carries the full residual;
    reshape(pp, dp) would put stage neighbours dp apart on the ring)."""
    devices = jax.devices()
    mesh = ppl.make_pp_mesh(2, dp=4)
    for d in range(4):
        for s in range(2):
            assert mesh.devices[s, d] == devices[d * 2 + s]


def test_pp_predict_raw_matches_eval_contract():
    """predict.raw must honor eval.predict's documented all-arguments form
    (visual, adapter, images, anchors, M) — the drop-in claim includes the
    re-jit escape hatch, not just the wrapper call."""
    clip, image_adapter, images, anchors, M = _setup(CFG, ACFG, batch=4)
    pp_fn = ppl.make_pipeline_predict_fn(clip, CFG, ACFG, pp=2, n_micro=2)
    pix0, score0 = pp_fn(image_adapter, images, anchors, M)
    pix1, score1 = pp_fn.raw(pp_fn.visual, image_adapter,
                             jnp.asarray(images), jnp.asarray(anchors),
                             jnp.asarray(M))
    np.testing.assert_allclose(np.asarray(pix1), np.asarray(pix0), atol=1e-6)
    np.testing.assert_allclose(np.asarray(score1), np.asarray(score0),
                               atol=1e-6)


def test_pp_validation():
    clip = create_clip_params(CFG, seed=0)
    with pytest.raises(ValueError, match="must divide the level count"):
        ppl.make_pipeline_predict_fn(clip, CFG, ACFG, pp=3)
    with pytest.raises(ValueError, match="needs 2"):
        ppl.make_pp_mesh(1)
    cfg4 = dataclasses.replace(
        CFG, vision=dataclasses.replace(CFG.vision, layers=4))
    with pytest.raises(ValueError, match="evenly spaced"):
        ppl.make_pipeline_predict_fn(
            create_clip_params(cfg4, seed=0), cfg4,
            AdapterConfig(levels=(1, 4), image_adapt_until=1), pp=2)
    with pytest.raises(ValueError, match="staged-precision"):
        ppl.make_pipeline_predict_fn(clip, CFG, ACFG, pp=2,
                                     policy=DtypePolicy(bf16_until=1))
    fn = ppl.make_pipeline_predict_fn(clip, CFG, ACFG, pp=2, n_micro=2)
    adapters = init_adapter_params(jax.random.PRNGKey(1), CFG, ACFG)
    with pytest.raises(ValueError, match="not divisible by n_micro"):
        fn(adapters["image"], np.zeros((3, 3, 70, 70), np.float32),
           np.zeros((CFG.embed_dim, 2), np.float32),
           np.zeros((70, 5), np.float32))
    with pytest.raises(ValueError, match="at least one level"):
        ppl.make_pipeline_predict_fn(
            clip, CFG, dataclasses.replace(ACFG, levels=()), pp=2)
    # the .raw escape hatch enforces the same batch contract as predict()
    vis_cast = fn.visual
    with pytest.raises(ValueError, match="not divisible by n_micro"):
        fn.raw(vis_cast, adapters["image"],
               jnp.zeros((3, 3, 70, 70), jnp.float32),
               jnp.zeros((CFG.embed_dim, 2), jnp.float32),
               jnp.zeros((70, 5), jnp.float32))
    # a stack depth that disagrees with acfg.image_adapt_until must fail
    # loudly (the blend gate is config-driven; silence would blend dummies)
    deep = init_adapter_params(
        jax.random.PRNGKey(1), CFG,
        dataclasses.replace(ACFG, image_adapt_until=2))
    with pytest.raises(ValueError, match="stack depth"):
        fn(deep["image"], np.zeros((4, 3, 70, 70), np.float32),
           np.zeros((CFG.embed_dim, 2), np.float32),
           np.zeros((70, 5), np.float32))


# ---------------------------------------------------------------------------
# Pipeline-parallel stage-2 TRAINING (make_pp_stage2_step)


def _train_setup(cfg, acfg, batch, seed=3):
    clip = create_clip_params(cfg, seed=0)
    adapters = init_adapter_params(jax.random.PRNGKey(1), cfg, acfg)
    rng = np.random.default_rng(seed)
    S = cfg.vision.image_size
    images = rng.standard_normal((batch, 3, S, S)).astype(np.float32)
    mask = (rng.random((batch, S, S)) > 0.8).astype(np.float32)
    label = (np.arange(batch) % 2).astype(np.int32)
    class_idx = (np.arange(batch) % 2).astype(np.int32)
    valid = np.ones((batch,), np.float32)
    anchors = rng.standard_normal((cfg.embed_dim, 2)).astype(np.float32)
    anchors /= np.linalg.norm(anchors, axis=0, keepdims=True)
    table = np.stack([anchors, anchors[:, ::-1]]).astype(np.float32)
    return clip, adapters, (images, mask, label, class_idx, valid), table


@pytest.mark.parametrize("n_micro", [2, 4])
def test_pp_stage2_step_matches_grad_accum(n_micro):
    """The GPipe training step must reproduce the single-device
    grad_accum=n_micro update (identical microbatch-mean semantics): the
    backward streams through ppermute's transpose, and per-stage level
    losses psum to the reference total."""
    from aaclip_tpu.train.optim import make_image_optimizer
    from aaclip_tpu.train.steps import init_state, make_stage2_step

    clip, adapters, batch, table = _train_setup(CFG, ACFG, batch=8)
    tx = make_image_optimizer(1e-3)
    s0 = make_stage2_step(clip, CFG, ACFG, tx, table, grad_accum=n_micro)
    st0, l0 = s0(init_state(adapters["image"], tx),
                 *(jnp.asarray(a) for a in batch))

    s1 = ppl.make_pp_stage2_step(clip, CFG, ACFG, tx, table, pp=2,
                                 n_micro=n_micro)
    st1, l1 = s1(init_state(adapters["image"], tx), *batch)
    np.testing.assert_allclose(float(l1), float(l0), rtol=1e-5)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-5, rtol=1e-4),
        st1.params, st0.params)


def test_pp_stage2_multi_step_and_cross_stage_adapters():
    """Two consecutive GPipe steps on a 4-stage tower whose adapters span
    stage boundaries (image_adapt_until=2: a REAL adapter lives on stage 1,
    which also processes bubble ticks — the NaN regression case) keep
    matching the single-device trainer."""
    from aaclip_tpu.train.optim import make_image_optimizer
    from aaclip_tpu.train.steps import init_state, make_stage2_step

    cfg = dataclasses.replace(
        CFG, vision=dataclasses.replace(CFG.vision, layers=4))
    acfg = AdapterConfig(levels=(1, 2, 3, 4), image_adapt_until=2,
                         text_adapt_until=1)
    clip, adapters, batch, table = _train_setup(cfg, acfg, batch=4)
    tx = make_image_optimizer(1e-3)
    s0 = make_stage2_step(clip, cfg, acfg, tx, table, grad_accum=2)
    s1 = ppl.make_pp_stage2_step(clip, cfg, acfg, tx, table, pp=4,
                                 n_micro=2)
    st0 = init_state(adapters["image"], tx)
    st1 = init_state(adapters["image"], tx)
    for _ in range(2):
        st0, l0 = s0(st0, *(jnp.asarray(a) for a in batch))
        st1, l1 = s1(st1, *batch)
        np.testing.assert_allclose(float(l1), float(l0), rtol=1e-5)
    assert not np.isnan(float(l1))
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-5, rtol=2e-4),
        st1.params, st0.params)


@pytest.mark.parametrize("valid_tail", [None, 2, 4])
def test_pp_dp_stage2_step_matches_grad_accum(valid_tail):
    """pp=2 x dp=4 training: each data shard contributes numerator sums
    and valid counts psummed over the data axis before division, so the
    update still equals single-device grad_accum=2 — including ragged
    batches (trailing invalid samples), where the per-term means run over
    the GLOBAL valid count.  valid_tail=4 makes the SECOND microbatch
    all-padding: both paths must exclude it from the loss and the
    normalizer (its dice terms are a constant, its gradient zero)."""
    from aaclip_tpu.train.optim import make_image_optimizer
    from aaclip_tpu.train.steps import init_state, make_stage2_step

    clip, adapters, batch, table = _train_setup(CFG, ACFG, batch=8)
    images, mask, label, class_idx, valid = batch
    if valid_tail:
        valid = valid.copy()
        valid[-valid_tail:] = 0.0
        batch = (images, mask, label, class_idx, valid)
    tx = make_image_optimizer(1e-3)
    s0 = make_stage2_step(clip, CFG, ACFG, tx, table, grad_accum=2)
    st0, l0 = s0(init_state(adapters["image"], tx),
                 *(jnp.asarray(a) for a in batch))
    s1 = ppl.make_pp_stage2_step(clip, CFG, ACFG, tx, table, pp=2,
                                 n_micro=2, dp=4)
    st1, l1 = s1(init_state(adapters["image"], tx), *batch)
    np.testing.assert_allclose(float(l1), float(l0), rtol=1e-5)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-5, rtol=1e-4),
        st1.params, st0.params)


def test_pp_stage1_spatial_matches_single_device():
    """PP over the surgery-feature trunk (stage-1 supervision, reference
    train.py:74-85): spatial V-V features are per-sample, so the GPipe
    stream must reproduce the single-device extraction exactly."""
    from aaclip_tpu.train.steps import stage1_features_fn

    clip = create_clip_params(CFG, seed=0)
    rng = np.random.default_rng(3)
    S = CFG.vision.image_size
    imgs = rng.standard_normal((8, 3, S, S)).astype(np.float32)
    f0 = stage1_features_fn(clip, CFG, surgery_until_layer=2,
                            vv_mode="spatial")(imgs)
    fn = ppl.make_pp_stage1_features_fn(clip, CFG, pp=2, n_micro=2,
                                        surgery_until_layer=2,
                                        vv_mode="spatial")
    np.testing.assert_allclose(np.asarray(fn(imgs)), np.asarray(f0),
                               atol=2e-5, rtol=1e-4)
    # dp composition on the ('stage','data') mesh stays exact (per-sample)
    fn_dp = ppl.make_pp_stage1_features_fn(clip, CFG, pp=2, n_micro=2,
                                           dp=4, surgery_until_layer=2,
                                           vv_mode="spatial")
    np.testing.assert_allclose(np.asarray(fn_dp(imgs)), np.asarray(f0),
                               atol=2e-5, rtol=1e-4)


def test_pp_stage1_batch_mode_couples_per_microbatch():
    """Batch-coupled V-V (the reference's layout quirk) under pipelining:
    the coupling unit is the microbatch, so PP features equal the
    single-device batch-mode run on each microbatch slice — and n_micro=1
    recovers full-batch coupling."""
    from aaclip_tpu.train.steps import stage1_features_fn

    clip = create_clip_params(CFG, seed=0)
    rng = np.random.default_rng(3)
    S = CFG.vision.image_size
    imgs = rng.standard_normal((8, 3, S, S)).astype(np.float32)
    single = stage1_features_fn(clip, CFG, surgery_until_layer=2)
    ref = np.concatenate([np.asarray(single(imgs[:4])),
                          np.asarray(single(imgs[4:]))])
    fn = ppl.make_pp_stage1_features_fn(clip, CFG, pp=2, n_micro=2,
                                        surgery_until_layer=2)
    np.testing.assert_allclose(np.asarray(fn(imgs)), ref,
                               atol=2e-5, rtol=1e-4)
    fn1 = ppl.make_pp_stage1_features_fn(clip, CFG, pp=2, n_micro=1,
                                         surgery_until_layer=2)
    np.testing.assert_allclose(np.asarray(fn1(imgs)),
                               np.asarray(single(imgs)),
                               atol=2e-5, rtol=1e-4)


def test_pp_stage1_batch_masked_tail():
    """A padded final batch: pad rows must be masked out of the
    microbatch's cross-batch softmax, matching the single-device
    masked-tail semantics for every valid sample."""
    from aaclip_tpu.train.steps import stage1_features_fn

    clip = create_clip_params(CFG, seed=0)
    rng = np.random.default_rng(5)
    S = CFG.vision.image_size
    imgs = rng.standard_normal((8, 3, S, S)).astype(np.float32)
    valid = np.ones(8, np.float32)
    valid[-2:] = 0.0
    single = stage1_features_fn(clip, CFG, surgery_until_layer=2)
    ref = np.concatenate([np.asarray(single(imgs[:4])),
                          np.asarray(single(imgs[4:], valid[4:]))])
    fn = ppl.make_pp_stage1_features_fn(clip, CFG, pp=2, n_micro=2,
                                        surgery_until_layer=2)
    got = np.asarray(fn(imgs, valid))
    np.testing.assert_allclose(got[valid.astype(bool)],
                               ref[valid.astype(bool)],
                               atol=2e-5, rtol=1e-4)


def test_pp_stage1_mid_stage_vv_boundary():
    """The V-V start rarely lands on a stage edge (ViT-L: vv_start=5,
    stages of 12): a 4-layer tower with vv_start=3 puts the boundary in
    the middle of stage 1 at pp=2 — the per-layer cond must switch
    mid-stage; pp=4 (one block per stage) exercises every flag layout."""
    from aaclip_tpu.train.steps import stage1_features_fn

    cfg = dataclasses.replace(
        CFG, vision=dataclasses.replace(CFG.vision, layers=4))
    clip = create_clip_params(cfg, seed=0)
    rng = np.random.default_rng(7)
    S = cfg.vision.image_size
    imgs = rng.standard_normal((8, 3, S, S)).astype(np.float32)
    f0 = stage1_features_fn(clip, cfg, surgery_until_layer=2,
                            vv_mode="spatial")(imgs)
    for pp, n_micro in ((2, 4), (4, 2)):
        fn = ppl.make_pp_stage1_features_fn(clip, cfg, pp=pp,
                                            n_micro=n_micro,
                                            surgery_until_layer=2,
                                            vv_mode="spatial")
        np.testing.assert_allclose(np.asarray(fn(imgs)), np.asarray(f0),
                                   atol=2e-5, rtol=1e-4)


def test_pp_stage1_validation():
    clip = create_clip_params(CFG, seed=0)
    with pytest.raises(ValueError, match="must divide"):
        ppl.make_pp_stage1_features_fn(clip, CFG, pp=3)
    with pytest.raises(ValueError, match="dp > 1"):
        ppl.make_pp_stage1_features_fn(clip, CFG, pp=2, dp=2,
                                       surgery_until_layer=2)
    with pytest.raises(ValueError, match="custom vv_attn_fn"):
        ppl.make_pp_stage1_features_fn(clip, CFG, pp=2,
                                       surgery_until_layer=2,
                                       vv_attn_fn=lambda h, p: h)
    with pytest.raises(ValueError, match="vv_mode"):
        ppl.make_pp_stage1_features_fn(clip, CFG, pp=2, vv_mode="typo")
    fn = ppl.make_pp_stage1_features_fn(clip, CFG, pp=2, n_micro=2,
                                        surgery_until_layer=2)
    S = CFG.vision.image_size
    with pytest.raises(ValueError, match="not divisible by n_micro"):
        fn(np.zeros((3, 3, S, S), np.float32))


def test_pp_stage2_validation():
    import optax

    clip, adapters, batch, table = _train_setup(CFG, ACFG, batch=8)
    with pytest.raises(ValueError, match="must divide the level count"):
        ppl.make_pp_stage2_step(clip, CFG, ACFG, optax.sgd(1e-3), table,
                                pp=3)
    with pytest.raises(ValueError, match="remat=True/False only"):
        # make_stage2_step accepts 'selective'; treating it as truthy here
        # would silently hand a porting caller full remat instead
        ppl.make_pp_stage2_step(clip, CFG, ACFG, optax.sgd(1e-3), table,
                                pp=2, remat="selective")
    step = ppl.make_pp_stage2_step(clip, CFG, ACFG, optax.sgd(1e-3), table,
                                   pp=2, n_micro=4)
    from aaclip_tpu.train.steps import init_state
    tx = optax.sgd(1e-3)
    images, mask, label, class_idx, valid = batch
    with pytest.raises(ValueError, match="not divisible by n_micro"):
        step(init_state(adapters["image"], tx), images[:6], mask[:6],
             label[:6], class_idx[:6], valid[:6])
