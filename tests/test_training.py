"""Two-stage training on the tiny config with synthetic data: losses are
finite and decrease, masked losses equal unmasked on full batches,
checkpoints round-trip (including torch .pth interop)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from aaclip_tpu.core.config import AdapterConfig, get_config
from aaclip_tpu.core.params import create_clip_params, init_adapter_params
from aaclip_tpu.ops import losses as LL
from aaclip_tpu.text.anchors import dataset_prompt_tokens
from aaclip_tpu.train import checkpoint as ckpt
from aaclip_tpu.train.optim import (
    make_image_optimizer,
    make_text_optimizer,
    multistep_schedule,
)
from aaclip_tpu.train.steps import (
    init_state,
    make_stage1_step,
    make_stage2_step,
    stage1_features_fn,
)

CFG = get_config("tiny-test")
ACFG = AdapterConfig(levels=(1, 2), image_adapt_until=1, text_adapt_until=1)


@pytest.fixture(scope="module")
def setup():
    clip = create_clip_params(CFG, seed=0)
    adapters = init_adapter_params(jax.random.PRNGKey(1), CFG, ACFG)
    rng = np.random.default_rng(2)
    B, S = 4, CFG.vision.image_size
    images = jnp.asarray(rng.standard_normal((B, 3, S, S)), jnp.float32)
    masks = jnp.asarray((rng.random((B, S, S)) > 0.8), jnp.float32)
    labels = jnp.asarray([0, 1, 0, 1], jnp.int32)
    class_idx = jnp.asarray([0, 1, 0, 1], jnp.int32)
    valid = jnp.ones((B,), jnp.float32)
    tokens = dataset_prompt_tokens("MVTec", ["bottle", "cable"])
    return clip, adapters, images, masks, labels, class_idx, valid, tokens


def test_stage1_step_decreases_loss(setup):
    clip, adapters, images, masks, _, class_idx, valid, tokens = setup
    feat_fn = stage1_features_fn(clip, CFG, surgery_until_layer=2)
    feats = feat_fn(images)
    assert feats.shape == (4, 25, CFG.embed_dim)
    tx = make_text_optimizer(lr=1e-3)
    step = make_stage1_step(clip, CFG, ACFG, tx, tokens)
    state = init_state(adapters["text"], tx)
    losses = []
    for _ in range(5):
        state, loss = step(state, feats, masks, class_idx, valid)
        losses.append(float(loss))
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0]


def test_stage2_step_decreases_loss(setup):
    clip, adapters, images, masks, labels, class_idx, valid, _ = setup
    rng = np.random.default_rng(3)
    table = rng.standard_normal((2, CFG.embed_dim, 2)).astype(np.float32)
    table /= np.linalg.norm(table, axis=1, keepdims=True)
    tx = make_image_optimizer(lr=1e-3)
    step = make_stage2_step(clip, CFG, ACFG, tx, table)
    state = init_state(adapters["image"], tx)
    losses = []
    for _ in range(5):
        state, loss = step(state, images, masks, labels, class_idx, valid)
        losses.append(float(loss))
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0]


def test_masked_losses_equal_unmasked_when_all_valid():
    rng = np.random.default_rng(4)
    d = jnp.asarray(rng.standard_normal((3, 8, 8)), jnp.float32)
    m = jnp.asarray(rng.random((3, 8, 8)) > 0.5, jnp.float32)
    v = jnp.ones((3,))
    np.testing.assert_allclose(
        float(LL.seg_loss_from_logit_masked(d, m, v)),
        float(LL.seg_loss_from_logit(d, m)), rtol=1e-6)
    logits = jnp.asarray(rng.standard_normal((3, 2)), jnp.float32)
    labels = jnp.asarray([0, 1, 1])
    np.testing.assert_allclose(
        float(LL.cross_entropy_logits_masked(logits, labels, v)),
        float(LL.cross_entropy_logits(logits, labels)), rtol=1e-6)


def test_masked_loss_ignores_padding():
    rng = np.random.default_rng(5)
    d = jnp.asarray(rng.standard_normal((3, 8, 8)), jnp.float32)
    m = jnp.asarray(rng.random((3, 8, 8)) > 0.5, jnp.float32)
    # padding row duplicated: loss with pad must equal loss without
    d_pad = jnp.concatenate([d, d[-1:]], axis=0)
    m_pad = jnp.concatenate([m, m[-1:]], axis=0)
    v_pad = jnp.asarray([1.0, 1.0, 1.0, 0.0])
    np.testing.assert_allclose(
        float(LL.seg_loss_from_logit_masked(d_pad, m_pad, v_pad)),
        float(LL.seg_loss_from_logit(d, m)), rtol=1e-6)


def test_multistep_schedule():
    s = multistep_schedule(1.0, (10, 20), 0.5)
    assert float(s(0)) == 1.0
    assert float(s(10)) == 0.5
    assert float(s(25)) == 0.25


def test_checkpoint_roundtrip(tmp_path, setup):
    clip, adapters, *_ = setup
    tx = make_image_optimizer()
    state = init_state(adapters["image"], tx)
    path = str(tmp_path / "image_adapter.npz")
    ckpt.save_adapter_checkpoint(path, epoch=3, adapter=state.params,
                                 opt_state=state.opt_state, step=42)
    epoch, adapter, opt_state, step = ckpt.load_adapter_checkpoint(
        path, adapters["image"], state.opt_state)
    assert epoch == 3 and step == 42
    for a, b in zip(jax.tree.leaves(adapter), jax.tree.leaves(state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert opt_state is not None


def test_checkpoint_save_is_atomic(tmp_path, setup):
    """Overwrite goes through tmp+rename: no tmp remnants, and a failed
    write never clobbers the existing checkpoint."""
    import os
    from unittest import mock

    clip, adapters, *_ = setup
    path = str(tmp_path / "image_adapter.npz")
    ckpt.save_adapter_checkpoint(path, epoch=1, adapter=adapters["image"])
    before = open(path, "rb").read()
    with mock.patch("numpy.savez", side_effect=OSError("disk full")):
        with pytest.raises(OSError):
            ckpt.save_adapter_checkpoint(path, epoch=2,
                                         adapter=adapters["image"])
    assert open(path, "rb").read() == before  # old checkpoint intact
    ckpt.save_adapter_checkpoint(path, epoch=2, adapter=adapters["image"])
    epoch, *_ = ckpt.load_adapter_checkpoint(path, adapters["image"])
    assert epoch == 2
    assert not [f for f in os.listdir(tmp_path) if ".tmp-" in f]


def test_torch_pth_interop(tmp_path, setup):
    import torch

    _, adapters, *_ = setup
    text_sd, image_sd = ckpt.adapters_to_torch_state_dicts(adapters, proj_relu=False)
    torch.save({"epoch": 5, "text_adapter": text_sd}, tmp_path / "text_adapter.pth")
    torch.save({"epoch": 7, "image_adapter": image_sd}, tmp_path / "image_adapter.pth")
    e1, text_back = ckpt.load_reference_checkpoint(
        str(tmp_path / "text_adapter.pth"), "text", n_adapt=ACFG.text_adapt_until)
    e2, image_back = ckpt.load_reference_checkpoint(
        str(tmp_path / "image_adapter.pth"), "image",
        n_adapt=ACFG.image_adapt_until, n_levels=len(ACFG.levels))
    assert e1 == 5 and e2 == 7
    for a, b in zip(jax.tree.leaves(text_back), jax.tree.leaves(adapters["text"])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
    for a, b in zip(jax.tree.leaves(image_back), jax.tree.leaves(adapters["image"])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_checkpoint_mismatch_errors(tmp_path, setup):
    """Loading with the wrong adapter flags fails with a clear message."""
    _, adapters, *_ = setup
    path = str(tmp_path / "image_adapter.npz")
    ckpt.save_adapter_checkpoint(path, 1, adapters["image"])
    from aaclip_tpu.core.config import AdapterConfig
    from aaclip_tpu.core.params import init_adapter_params

    wrong = init_adapter_params(
        jax.random.PRNGKey(0), CFG,
        AdapterConfig(levels=(1, 2), image_adapt_until=2, text_adapt_until=1))
    with pytest.raises((KeyError, ValueError), match="adapter flags"):
        ckpt.load_adapter_checkpoint(path, wrong["image"])


def test_checkpoint_rejects_shape_mismatch_same_size(tmp_path, setup):
    """A size-only check would let a same-size wrong-shape leaf (e.g. a
    transposed weight) silently reshape into scrambled values; the loader
    must compare exact shapes (round-3 review finding)."""
    _, adapters, *_ = setup
    transposed = dict(adapters["image"])
    transposed["det_proj"] = {
        "w": np.asarray(adapters["image"]["det_proj"]["w"]).T.copy()}
    path = str(tmp_path / "image_adapter.npz")
    ckpt.save_adapter_checkpoint(path, 1, transposed)
    with pytest.raises(ValueError, match="adapter flags"):
        ckpt.load_adapter_checkpoint(path, adapters["image"])


def test_orbax_load_without_opt_state_degrades_gracefully(tmp_path):
    """The npz loader returns opt_state=None when the snapshot lacks it
    even if a template is passed; the orbax loader must match instead of
    crashing on a tree-structure mismatch (round-3 review finding)."""
    import jax

    from aaclip_tpu.core.config import AdapterConfig, get_config
    from aaclip_tpu.core.params import init_adapter_params
    from aaclip_tpu.train.optim import make_image_optimizer
    from aaclip_tpu.train.steps import init_state

    cfg = get_config("tiny-test")
    acfg = AdapterConfig(levels=(1, 2), image_adapt_until=1,
                         text_adapt_until=1)
    adapters = init_adapter_params(jax.random.PRNGKey(5), cfg, acfg)
    tx = make_image_optimizer(1e-3)
    state = init_state(adapters["image"], tx)
    path = str(tmp_path / "image_adapter_4.npz")
    ckpt.save_adapter_checkpoint_any(path, 4, adapters["image"],
                                     backend="orbax")  # no opt_state
    ckpt.wait_for_async_saves()
    epoch, adapter, opt_state, step = ckpt.load_adapter_checkpoint_any(
        ckpt.orbax_path(path), adapters["image"],
        opt_state_template=state.opt_state)
    assert epoch == 4 and opt_state is None
    for a, b in zip(jax.tree.leaves(adapter),
                    jax.tree.leaves(adapters["image"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_orbax_checkpoint_roundtrip(tmp_path):
    """Orbax backend: async save -> restore equals the saved state
    (adapter + optimizer + counters), matching the npz loader contract."""
    import jax

    from aaclip_tpu.core.config import AdapterConfig, get_config
    from aaclip_tpu.core.params import init_adapter_params
    from aaclip_tpu.train import checkpoint as ckpt
    from aaclip_tpu.train.optim import make_image_optimizer
    from aaclip_tpu.train.steps import init_state

    cfg = get_config("tiny-test")
    acfg = AdapterConfig(levels=(1, 2), image_adapt_until=1, text_adapt_until=1)
    adapters = init_adapter_params(jax.random.PRNGKey(5), cfg, acfg)
    tx = make_image_optimizer(1e-3)
    state = init_state(adapters["image"], tx)

    path = str(tmp_path / "image_adapter_3.npz")
    ckpt.save_adapter_checkpoint_any(path, 3, state.params, state.opt_state,
                                     step=42, backend="orbax")
    ckpt.wait_for_async_saves()
    found = ckpt.find_adapter_checkpoint(path)
    assert found and found.endswith(".orbax")

    epoch, adapter, opt_state, step = ckpt.load_adapter_checkpoint_any(
        found, adapters["image"], state.opt_state)
    assert (epoch, step) == (3, 42)
    for a, b in zip(jax.tree.leaves(adapter), jax.tree.leaves(state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree.leaves(opt_state), jax.tree.leaves(state.opt_state)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # loading without an optimizer template also works (test.py path)
    epoch2, adapter2, none_opt, _ = ckpt.load_adapter_checkpoint_any(
        found, adapters["image"])
    assert epoch2 == 3 and none_opt is None


def test_stage1_features_match_two_pass_reference(setup):
    """The fused shared-prefix stage-1 features must equal the naive
    composition of the two full towers (surgery patch features + frozen
    CLS), as the reference computes them (train.py:74-85)."""
    from aaclip_tpu.models import layers as Lyr
    from aaclip_tpu.models.vit import encode_image, surgery_patch_features

    clip, _, images, *_ = setup
    for sul in (1, 2, 3):  # vv_start = 2, 1, 0 on the 2-layer tiny tower
        fused = stage1_features_fn(clip, CFG, surgery_until_layer=sul)(images)
        feats = surgery_patch_features(
            clip["visual"], CFG, images, out_layers=[CFG.vision.layers],
            surgery_until_layer=sul)[0]
        cls, _ = encode_image(clip["visual"], CFG, images, ())
        want = Lyr.l2_normalize(feats) + Lyr.l2_normalize(cls)[:, None, :]
        np.testing.assert_array_equal(np.asarray(fused), np.asarray(want))


def test_stage1_vv_batch_mode_couples_the_batch(setup):
    """Reference quirk preserved: with vv_mode='batch' (the default) a
    sample's stage-1 supervision features depend on its batchmates — the
    reference's surgery Attention treats the seq-first stream as
    batch-first (reference model/transformer.py:125-152 + :528), attending
    across the batch at each position.  'spatial' mode (the intended
    CLIP-Surgery form) is batch-composition independent."""
    clip, _, images, *_ = setup
    x1, x2 = images[:1], images[1:2]
    x3 = x2[:, :, ::-1, :]  # a different batchmate
    for mode, coupled in (("batch", True), ("spatial", False)):
        fn = stage1_features_fn(clip, CFG, surgery_until_layer=2,
                                vv_mode=mode)
        fa = np.asarray(fn(jnp.concatenate([x1, x2]))[0])
        fb = np.asarray(fn(jnp.concatenate([x1, x3]))[0])
        delta = np.abs(fa - fb).max()
        if coupled:
            assert delta > 1e-4, f"batch mode should couple samples: {delta}"
        else:
            assert delta < 1e-5, f"spatial mode must not couple: {delta}"


def test_stage1_vv_batch_masked_pad_equals_unpadded_tail(setup):
    """A padded final stage-1 batch must reproduce the reference's SMALLER
    unpadded tail batch: the batch-coupled V-V softmax sees only the real
    samples when the validity mask is passed (without it, pad rows leak
    into every valid sample's features — the pre-fix behavior)."""
    clip, _, images, *_ = setup
    tail = images[:3]                                 # the "real" tail batch
    padded = jnp.concatenate([tail, images[3:4]])     # + one pad row
    valid = jnp.asarray([1.0, 1.0, 1.0, 0.0], jnp.float32)

    fn = stage1_features_fn(clip, CFG, surgery_until_layer=2,
                            vv_mode="batch")
    want = np.asarray(fn(tail))                       # reference semantics
    got = np.asarray(fn(padded, valid))[:3]
    np.testing.assert_allclose(got, want, atol=1e-5)

    # and the pre-fix failure mode is real: unmasked padded != tail
    leaky = np.asarray(fn(padded))[:3]
    assert np.abs(leaky - want).max() > 1e-4

    # spatial mode is per-sample: valid is accepted and irrelevant
    fs = stage1_features_fn(clip, CFG, surgery_until_layer=2,
                            vv_mode="spatial")
    np.testing.assert_allclose(np.asarray(fs(padded, valid))[:3],
                               np.asarray(fs(tail)), atol=1e-5)


def test_stage2_grads_identical_across_remat_modes(setup):
    """Rematerialization must not change the math: stage-2 loss and updated
    parameters are identical (recomputed values are deterministic) for
    remat = full / selective / off."""
    clip, adapters, images, masks, labels, class_idx, valid, _ = setup
    rng = np.random.default_rng(5)
    table = rng.standard_normal((2, CFG.embed_dim, 2)).astype(np.float32)
    table /= np.linalg.norm(table, axis=1, keepdims=True)

    results = {}
    for mode in (True, "selective", False):
        tx = make_image_optimizer(lr=1e-3)
        step = make_stage2_step(clip, CFG, ACFG, tx, table, remat=mode)
        state = init_state(adapters["image"], tx)
        state, loss = step(state, images, masks, labels, class_idx, valid)
        results[mode] = (float(loss),
                         jax.tree.map(np.asarray, state.params))
    base_loss, base_params = results[True]
    for mode in ("selective", False):
        loss, params = results[mode]
        assert loss == base_loss, (mode, loss, base_loss)
        for a, b in zip(jax.tree.leaves(base_params), jax.tree.leaves(params)):
            np.testing.assert_allclose(a, b, rtol=0, atol=1e-7)


def test_stage2_grad_accum_matches_big_batch(setup):
    """grad_accum=K on a full (all-valid) batch must reproduce the K=1
    update: every loss term is a per-sample mean over valid samples, so
    the microbatch-mean gradient equals the big-batch gradient up to fp
    reassociation."""
    clip, adapters, images, masks, labels, class_idx, valid, _ = setup
    rng = np.random.default_rng(6)
    table = rng.standard_normal((2, CFG.embed_dim, 2)).astype(np.float32)
    table /= np.linalg.norm(table, axis=1, keepdims=True)

    results = {}
    for k in (1, 2, 4):
        tx = make_image_optimizer(lr=1e-3)
        step = make_stage2_step(clip, CFG, ACFG, tx, table, grad_accum=k)
        state = init_state(adapters["image"], tx)
        state, loss = step(state, images, masks, labels, class_idx, valid)
        results[k] = (float(loss), jax.tree.map(np.asarray, state.params))

    base_loss, base_params = results[1]
    for k in (2, 4):
        loss, params = results[k]
        np.testing.assert_allclose(loss, base_loss, rtol=1e-5)
        for a, b in zip(jax.tree.leaves(base_params),
                        jax.tree.leaves(params)):
            np.testing.assert_allclose(a, b, rtol=1e-4, atol=2e-6)


def test_stage2_grad_accum_skips_all_padding_microbatch(setup):
    """A ragged final batch can leave a whole microbatch all-padding; its
    gradient is exactly zero but its dice terms are a constant 2.0/level
    (losses.py), so it must be excluded from the reported loss AND the
    normalizer — the step then equals running only the live microbatches
    (round-3 review finding)."""
    clip, adapters, images, masks, labels, class_idx, _, _ = setup
    rng = np.random.default_rng(8)
    table = rng.standard_normal((2, CFG.embed_dim, 2)).astype(np.float32)
    table /= np.linalg.norm(table, axis=1, keepdims=True)
    valid_ragged = jnp.asarray([1.0, 1.0, 0.0, 0.0])

    tx = make_image_optimizer(lr=1e-3)
    step = make_stage2_step(clip, CFG, ACFG, tx, table, grad_accum=2)
    state, loss = step(init_state(adapters["image"], tx), images, masks,
                       labels, class_idx, valid_ragged)

    tx2 = make_image_optimizer(lr=1e-3)
    step2 = make_stage2_step(clip, CFG, ACFG, tx2, table, grad_accum=1)
    state2, loss2 = step2(init_state(adapters["image"], tx2), images[:2],
                          masks[:2], labels[:2], class_idx[:2],
                          jnp.ones((2,), jnp.float32))

    np.testing.assert_allclose(float(loss), float(loss2), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(jax.tree.map(np.asarray, state.params)),
                    jax.tree.leaves(jax.tree.map(np.asarray, state2.params))):
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=2e-6)


def test_stage2_grad_accum_validates_divisibility(setup):
    clip, adapters, images, masks, labels, class_idx, valid, _ = setup
    table = np.zeros((2, CFG.embed_dim, 2), np.float32)
    tx = make_image_optimizer(lr=1e-3)
    step = make_stage2_step(clip, CFG, ACFG, tx, table, grad_accum=3)
    with pytest.raises(ValueError, match="not divisible by grad_accum"):
        step(init_state(adapters["image"], tx), images, masks, labels,
             class_idx, valid)
    with pytest.raises(ValueError, match="grad_accum must be"):
        make_stage2_step(clip, CFG, ACFG, tx, table, grad_accum=0)


def test_stage1_feature_chunking_exact_in_spatial_mode(setup):
    """chunk=N (spatial V-V) extracts features piecewise and must match
    the whole-batch pass (per-sample semantics — equal up to XLA's
    batch-size-dependent reduction tiling); batch mode rejects chunking
    (features are batch-coupled)."""
    clip, *_ = setup
    rng = np.random.default_rng(7)
    images = jnp.asarray(rng.standard_normal(
        (6, 3, CFG.vision.image_size, CFG.vision.image_size)), jnp.float32)
    whole = stage1_features_fn(clip, CFG, surgery_until_layer=2,
                               vv_mode="spatial")(images)
    for chunk in (2, 4):   # 4 exercises the ragged tail (6 = 4 + 2)
        parts = stage1_features_fn(clip, CFG, surgery_until_layer=2,
                                   vv_mode="spatial", chunk=chunk)(images)
        np.testing.assert_allclose(np.asarray(parts), np.asarray(whole),
                                   atol=2e-6, rtol=1e-5)
    with pytest.raises(ValueError, match="batch-coupled"):
        stage1_features_fn(clip, CFG, surgery_until_layer=2,
                           vv_mode="batch", chunk=2)
    with pytest.raises(ValueError, match="chunk must be"):
        stage1_features_fn(clip, CFG, surgery_until_layer=2,
                           vv_mode="spatial", chunk=-4)
    with pytest.raises(ValueError, match="custom vv_attn_fn"):
        stage1_features_fn(clip, CFG, surgery_until_layer=2,
                           vv_attn_fn=lambda h, p: h)


def test_stage1_grads_identical_across_remat_modes(setup):
    """Text-tower remat modes must also leave loss/params unchanged.

    The loss is checked to 1-ulp: jax.checkpoint moves XLA fusion
    boundaries, which can legally shift the final reduction by one
    float32 rounding step even though every recomputed value is
    deterministic."""
    clip, adapters, images, masks, _, class_idx, valid, tokens = setup
    feats = stage1_features_fn(clip, CFG, surgery_until_layer=2)(images)
    results = {}
    for mode in (True, "selective", False):
        tx = make_text_optimizer(lr=1e-3)
        step = make_stage1_step(clip, CFG, ACFG, tx, tokens, remat=mode)
        state = init_state(adapters["text"], tx)
        state, loss = step(state, feats, masks, class_idx, valid)
        results[mode] = (float(loss), jax.tree.map(np.asarray, state.params))
    base_loss, base_params = results[True]
    ulp = float(np.spacing(np.float32(base_loss)))
    for mode in ("selective", False):
        loss, params = results[mode]
        assert abs(loss - base_loss) <= ulp, (mode, loss, base_loss)
        for a, b in zip(jax.tree.leaves(base_params), jax.tree.leaves(params)):
            np.testing.assert_allclose(a, b, rtol=0, atol=1e-7)
