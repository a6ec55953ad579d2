"""Device color jitter (Pillow parity) + device-resident dataset cache.

Pins: (1) ops/augment.jitter_chain is bit-exact to Pillow's ImageEnhance
Brightness->Contrast->Color chain for dyadic factors (the device cache's
stage-2 jitter); (2) the cache loader reproduces BatchLoader's shuffle
permutation and final-batch padding and — for the jitter-free text stage —
yields batches BIT-IDENTICAL to the host-loader --device_augment path;
(3) the train CLI runs end-to-end with --cache_device and rejects
incompatible flag combinations.
"""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tests.synthetic import make_synthetic_dataset


@pytest.mark.parametrize("fb,fc,fs", [
    (0.5, 1.25, 0.75), (1.375, 0.625, 1.0), (1.0, 1.0, 1.0),
    (0.5, 0.5, 0.5), (1.5, 1.5, 1.5),
])
def test_jitter_chain_matches_pillow(fb, fc, fs):
    """Dyadic factors make every blend exact in float32, so the device
    chain must equal Pillow byte-for-byte (including the truncation
    rounding and the int(mean+0.5) contrast anchor)."""
    from PIL import Image, ImageEnhance

    from aaclip_tpu.ops.augment import jitter_chain

    rng = np.random.default_rng(11)
    arr = rng.integers(0, 256, (24, 20, 3), dtype=np.uint8)
    img = Image.fromarray(arr, "RGB")
    img = ImageEnhance.Brightness(img).enhance(fb)
    img = ImageEnhance.Contrast(img).enhance(fc)
    img = ImageEnhance.Color(img).enhance(fs)
    want = np.asarray(img).transpose(2, 0, 1)  # HWC -> CHW
    got = np.asarray(jitter_chain(jnp.asarray(arr.transpose(2, 0, 1)),
                                  jnp.float32(fb), jnp.float32(fc),
                                  jnp.float32(fs)))
    np.testing.assert_array_equal(got, want)


def test_color_jitter_device_distribution():
    """Gated batch form: p=0 is the identity; p=1 changes most images;
    output stays uint8 in range."""
    from aaclip_tpu.ops.augment import color_jitter_device

    rng = np.random.default_rng(3)
    imgs = jnp.asarray(rng.integers(0, 256, (6, 3, 16, 16), dtype=np.uint8))
    same = color_jitter_device(jax.random.PRNGKey(0), imgs, p=0.0)
    np.testing.assert_array_equal(np.asarray(same), np.asarray(imgs))
    jit = color_jitter_device(jax.random.PRNGKey(0), imgs, p=1.0)
    assert jit.dtype == jnp.uint8
    diff = [not np.array_equal(np.asarray(jit[i]), np.asarray(imgs[i]))
            for i in range(6)]
    assert sum(diff) >= 5  # p=1 jitters essentially every image


@pytest.fixture()
def synth_env(tmp_path):
    data_root, meta_root = make_synthetic_dataset(str(tmp_path), img_px=64)
    old = dict(os.environ)
    os.environ["AACLIP_DATA"] = data_root
    os.environ["AACLIP_METADATA"] = meta_root
    yield str(tmp_path)
    os.environ.clear()
    os.environ.update(old)


def test_cache_loader_matches_host_loader_text_stage(synth_env):
    """Text stage (no jitter): the cache loader's batches must match
    BatchLoader + device_batch + device-augment — same shuffle
    permutation (SeedSequence([seed, epoch])), same raw uint8 pixels,
    same fold_in augmentation keys, same padding/validity.  Images match
    to float roundoff only (the two pipelines are separate XLA programs,
    so the normalize may FMA-contract differently); the integer-valued
    masks/labels/validity must be exact."""
    from aaclip_tpu.data.datasets import BatchLoader, get_train_datasets
    from aaclip_tpu.data.device_cache import DeviceCacheLoader
    from aaclip_tpu.ops.augment import make_device_augment

    text_ds, _ = get_train_datasets("MVTec", 70, -1, seed=111,
                                    device_augment=True)
    cls_to_idx = {"bottle": 0, "cable": 1}
    aug_base = jax.random.PRNGKey(111 ^ 0x5EED)
    aug_fn = make_device_augment(uint8_inputs=True)

    cache = DeviceCacheLoader(text_ds, cls_to_idx, batch_size=4, seed=111,
                              text_stage=True, aug_base=aug_base)
    host = BatchLoader(text_ds, 4, shuffle=True, seed=111, num_workers=2)

    for epoch in range(2):  # two epochs: different permutations and keys
        got = list(cache)
        want = []
        for it, batch in enumerate(host):
            images = jnp.asarray(batch["image"])
            mask = jnp.asarray(
                batch["mask"].reshape(images.shape[0], 70, 70))
            key = jax.random.fold_in(jax.random.fold_in(
                jax.random.fold_in(aug_base, 1), epoch), it)
            aimg, amask = aug_fn(key, images, mask)
            label = np.asarray(batch["label"])
            cidx = np.asarray([cls_to_idx[c] for c in batch["class_name"]])
            valid = (np.arange(4) < batch["n_valid"]).astype(np.float32)
            want.append((aimg, amask, label, cidx, valid))
        assert len(got) == len(want)
        for (gi, gm, gl, gc, gv), (wi, wm, wl, wc, wv) in zip(got, want):
            np.testing.assert_allclose(np.asarray(gi), np.asarray(wi),
                                       atol=1e-6, rtol=5e-5)
            np.testing.assert_array_equal(np.asarray(gm), np.asarray(wm))
            np.testing.assert_array_equal(np.asarray(gl), wl)
            np.testing.assert_array_equal(np.asarray(gc), wc)
            np.testing.assert_array_equal(np.asarray(gv), wv)


def test_cache_loader_padding_and_len(synth_env):
    from aaclip_tpu.data.datasets import get_train_datasets
    from aaclip_tpu.data.device_cache import DeviceCacheLoader, cache_nbytes

    text_ds, _ = get_train_datasets("MVTec", 70, -1, seed=111,
                                    device_augment=True)
    n = len(text_ds)
    bs = 5
    cache = DeviceCacheLoader(text_ds, {"bottle": 0, "cable": 1},
                              batch_size=bs, seed=111, text_stage=True,
                              aug_base=jax.random.PRNGKey(0))
    batches = list(cache)
    assert len(batches) == -(-n // bs) == len(cache)
    last_valid = np.asarray(batches[-1][4])
    assert last_valid.sum() == n - (len(batches) - 1) * bs
    assert cache.epoch == 1  # advances like BatchLoader
    assert cache_nbytes(n, 70) == n * 4 * 70 * 70 + n * 8


def test_train_cli_cache_device(synth_env):
    """train.py --device_augment --cache_device: both stages train
    end-to-end from the device-resident cache with finite losses."""
    import re

    import train as train_cli

    save = os.path.join(synth_env, "ckpt_cache")
    train_cli.main([
        "--model_name", "tiny-test", "--img_size", "70",
        "--dataset", "MVTec", "--text_adapt_until", "1",
        "--image_adapt_until", "1", "--levels", "1", "2",
        "--num_workers", "2", "--save_path", save,
        "--training_mode", "full_shot", "--text_epoch", "1",
        "--image_epoch", "1", "--text_batch_size", "4",
        "--image_batch_size", "4", "--surgery_until_layer", "2",
        "--device_augment", "--cache_device",
    ])
    assert os.path.isfile(os.path.join(save, "image_adapter_1.npz"))
    log = open(os.path.join(save, "train.log")).read()
    assert "cache_device: uploading" in log
    losses = [float(m) for m in re.findall(r"loss: ([\d.]+)", log)]
    assert len(losses) == 2 and all(np.isfinite(losses))


def test_cache_device_flag_guards(synth_env):
    import train as train_cli

    with pytest.raises(SystemExit):
        train_cli.parse_args(["--cache_device"])  # needs --device_augment
    with pytest.raises(SystemExit):
        train_cli.parse_args(["--cache_device", "--device_augment",
                              "--data_parallel"])
    with pytest.raises(SystemExit):
        train_cli.parse_args(["--cache_device", "--device_augment",
                              "--tensor_parallel", "2"])
    with pytest.raises(SystemExit):
        train_cli.parse_args(["--fused_assemble"])  # needs --cache_device


def test_fused_assemble_matches_unfused(synth_env):
    """make_fused_step (round 5): folding batch k+1's assembly into step
    k's program must not change ANYTHING — same assemble + step impls
    inlined, same RNG plan — so the per-step losses and the final params
    equal the separate-programs loop."""
    from aaclip_tpu.core.config import AdapterConfig, get_config
    from aaclip_tpu.core.params import create_clip_params, init_adapter_params
    from aaclip_tpu.data.datasets import get_train_datasets
    from aaclip_tpu.data.device_cache import DeviceCacheLoader
    from aaclip_tpu.train.optim import make_image_optimizer
    from aaclip_tpu.train.steps import init_state, make_stage2_step

    cfg = get_config("tiny-test")
    acfg = AdapterConfig(levels=(1, 2), image_adapt_until=1,
                         text_adapt_until=1)
    clip = create_clip_params(cfg, seed=0)
    adapters = init_adapter_params(jax.random.PRNGKey(1), cfg, acfg)
    rng = np.random.default_rng(5)
    table = rng.standard_normal((2, cfg.embed_dim, 2)).astype(np.float32)
    table /= np.linalg.norm(table, axis=1, keepdims=True)
    _, image_ds = get_train_datasets("MVTec", 70, -1, seed=111,
                                     device_augment=True)
    cls_to_idx = {"bottle": 0, "cable": 1}
    aug_base = jax.random.PRNGKey(7)

    def make_loader():
        return DeviceCacheLoader(image_ds, cls_to_idx, batch_size=4,
                                 seed=111, text_stage=False,
                                 aug_base=aug_base)

    tx = make_image_optimizer(1e-3)
    step = make_stage2_step(clip, cfg, acfg, tx, table)

    # separate-programs epoch
    st0 = init_state(adapters["image"], tx)
    losses0 = []
    for images, mask, label, cidx, valid in make_loader():
        st0, l = step(st0, images, mask, label, cidx, valid)
        losses0.append(float(l))

    # fused epoch (the train.py --fused_assemble loop shape)
    loader = make_loader()
    fused = loader.make_fused_step(step)
    st1 = init_state(adapters["image"], tx)
    plan = loader.epoch_plan()
    batch = loader.assemble(plan[0][0], plan[0][1])
    valid = jnp.asarray(plan[0][2])
    losses1 = []
    for it in range(len(plan)):
        nidx, nkey, nvalid = plan[(it + 1) % len(plan)]
        st1, l, batch = fused(st1, *batch, valid, nidx, nkey)
        valid = jnp.asarray(nvalid)
        losses1.append(float(l))
    np.testing.assert_allclose(losses1, losses0, rtol=1e-5)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-5, rtol=1e-5),
        st1.params, st0.params)


def test_train_cli_fused_assemble(synth_env):
    """train.py --fused_assemble end-to-end: stage 2 runs the fused loop
    (log line present) with finite losses, and a RESUMED run (epoch 1 ->
    epoch 2 in a second process) continues through the fused path with
    the correct epoch's shuffle/augment plan."""
    import re

    import train as train_cli

    common = [
        "--model_name", "tiny-test", "--img_size", "70",
        "--dataset", "MVTec", "--text_adapt_until", "1",
        "--image_adapt_until", "1", "--levels", "1", "2",
        "--num_workers", "2",
        "--training_mode", "full_shot", "--text_epoch", "0",
        "--image_batch_size", "4", "--surgery_until_layer", "2",
        "--device_augment", "--cache_device", "--fused_assemble",
    ]
    save = os.path.join(synth_env, "ckpt_fused")
    train_cli.main(common + ["--save_path", save, "--image_epoch", "2"])
    assert os.path.isfile(os.path.join(save, "image_adapter_2.npz"))
    log = open(os.path.join(save, "train.log")).read()
    assert "fused_assemble: batch k+1 assembles inside step k" in log
    losses = [float(m) for m in re.findall(r"loss: ([\d.]+)", log)]
    assert len(losses) == 2 and all(np.isfinite(losses))

    # resume: epoch 0 in one run, epoch 1 in a fresh invocation — the
    # second run's fused loop must start from the checkpoint and train
    # exactly one more epoch (epoch_plan keyed off the resumed epoch)
    save2 = os.path.join(synth_env, "ckpt_fused_resume")
    train_cli.main(common + ["--save_path", save2, "--image_epoch", "1"])
    train_cli.main(common + ["--save_path", save2, "--image_epoch", "2"])
    assert os.path.isfile(os.path.join(save2, "image_adapter_2.npz"))
    log2 = open(os.path.join(save2, "train.log")).read()
    assert "training image epoch 1" in log2
    # the resumed process trains epoch 1 only (epoch 0 came from run 1)
    assert log2.count("training image epoch 0") == 1
    losses2 = [float(m) for m in re.findall(r"loss: ([\d.]+)", log2)]
    assert len(losses2) == 2 and all(np.isfinite(losses2))
