"""On-device joint geometric augmentation vs the host pipeline."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from aaclip_tpu.data.transforms import _affine_nearest
from aaclip_tpu.ops.augment import (
    _nearest_affine_one,
    joint_geometric_augment_device,
)


@pytest.mark.parametrize("angle,ty,tx", [
    (17.3, 0.0, 0.0), (-29.9, 0.0, 0.0), (0.0, 4.0, -6.0), (45.0, 0.0, 0.0),
])
def test_device_affine_matches_host(angle, ty, tx):
    rng = np.random.default_rng(0)
    x = rng.random((4, 33, 37)).astype(np.float32)
    want = _affine_nearest(x.copy(), angle, (ty, tx))
    got = np.asarray(_nearest_affine_one(
        jnp.asarray(x), jnp.float32(angle), jnp.float32(ty), jnp.float32(tx)))
    np.testing.assert_array_equal(got, want)


def test_device_affine_identity_is_exact():
    rng = np.random.default_rng(1)
    x = rng.random((4, 32, 32)).astype(np.float32)
    got = np.asarray(_nearest_affine_one(
        jnp.asarray(x), jnp.float32(0), jnp.float32(0), jnp.float32(0)))
    np.testing.assert_array_equal(got, x)


def test_fused_augment_matches_sequential_stages():
    """The fused one-gather augment must be BIT-IDENTICAL to applying the
    four pipeline stages sequentially (rotation affine -> translation
    affine -> hflip -> vflip) with the same drawn parameters — the
    composition claim of _fused_geom_indices."""
    from aaclip_tpu.ops.augment import (_augment_one, _draw_geom_params)

    rng = np.random.default_rng(5)
    H = 24
    img = jnp.asarray(rng.random((3, H, H)).astype(np.float32))
    mask = jnp.asarray((rng.random((H, H)) > 0.6).astype(np.float32))
    for seed in range(24):  # covers all gate combinations with margin
        key = jax.random.PRNGKey(seed)
        angle, ty, tx, hflip, vflip = _draw_geom_params(key, H, H)
        stacked = jnp.concatenate([img, mask[None]], axis=0)
        seq = _nearest_affine_one(stacked, angle, jnp.float32(0),
                                  jnp.float32(0))
        seq = _nearest_affine_one(seq, jnp.float32(0), ty, tx)
        seq = jnp.where(hflip, seq[:, :, ::-1], seq)
        seq = jnp.where(vflip, seq[:, ::-1, :], seq)
        got_i, got_m = _augment_one(key, img, mask)
        np.testing.assert_array_equal(np.asarray(got_i),
                                      np.asarray(seq[:3]), err_msg=str(seed))
        np.testing.assert_array_equal(np.asarray(got_m),
                                      np.asarray(seq[3]), err_msg=str(seed))


def test_batch_augment_semantics():
    """Batch form: per-sample independence, binary masks preserved, pixel
    values are a permutation-with-zero-fill of the input (nearest, no
    interpolation), deterministic in the key."""
    rng = np.random.default_rng(2)
    B, H = 6, 24
    imgs = rng.random((B, 3, H, H)).astype(np.float32) + 0.5
    masks = (rng.random((B, H, H)) > 0.7).astype(np.float32)
    key = jax.random.PRNGKey(0)
    out_i, out_m = joint_geometric_augment_device(key, jnp.asarray(imgs),
                                                  jnp.asarray(masks))
    out_i, out_m = np.asarray(out_i), np.asarray(out_m)
    assert out_i.shape == imgs.shape and out_m.shape == masks.shape
    assert set(np.unique(out_m)) <= {0.0, 1.0}
    for b in range(B):
        vals = set(np.round(out_i[b].ravel(), 6)) - {0.0}
        src = set(np.round(imgs[b].ravel(), 6))
        assert vals <= src  # nearest resampling never invents values

    # deterministic; different keys differ
    out_i2, _ = joint_geometric_augment_device(key, jnp.asarray(imgs),
                                               jnp.asarray(masks))
    np.testing.assert_array_equal(out_i, np.asarray(out_i2))
    out_i3, _ = joint_geometric_augment_device(jax.random.PRNGKey(7),
                                               jnp.asarray(imgs),
                                               jnp.asarray(masks))
    assert np.abs(out_i - np.asarray(out_i3)).max() > 0

    # samples draw independent transforms: not all identical when inputs are
    identical = jnp.broadcast_to(imgs[:1], imgs.shape)
    out_same, _ = joint_geometric_augment_device(
        key, identical, jnp.broadcast_to(masks[:1], masks.shape))
    out_same = np.asarray(out_same)
    assert any(np.abs(out_same[b] - out_same[0]).max() > 0 for b in range(1, B))


def test_uint8_device_path_bitwise_matches_float_path():
    """uint8 transfer mode: on-device normalize-then-augment equals
    augmenting host-normalized floats to float roundoff (XLA may contract
    the normalize's mul+sub into FMAs: <=2 ulp); masks exact."""
    from aaclip_tpu.data.transforms import normalize_uint8_chw
    from aaclip_tpu.ops.augment import make_device_augment

    rng = np.random.default_rng(3)
    B, H = 3, 28
    u8 = rng.integers(0, 256, (B, 3, H, H), dtype=np.uint8)
    m8 = (rng.random((B, H, H)) > 0.8).astype(np.uint8)
    host_norm = np.stack([normalize_uint8_chw(x) for x in u8])
    key = jax.random.PRNGKey(9)
    f_imgs, f_masks = make_device_augment()(key, jnp.asarray(host_norm),
                                            jnp.asarray(m8, jnp.float32))
    u_imgs, u_masks = make_device_augment(uint8_inputs=True)(
        key, jnp.asarray(u8), jnp.asarray(m8))
    np.testing.assert_allclose(np.asarray(u_imgs), np.asarray(f_imgs),
                               atol=5e-7, rtol=0)
    np.testing.assert_array_equal(np.asarray(u_masks), np.asarray(f_masks))


def test_packed_augment_matches_float_path():
    """Packed uint32 gather (joint_geometric_augment_device_u8) is
    BIT-identical to the float path: same key -> same draws -> same
    (sy, sx, valid); normalize commutes with the gather, and
    where(valid, ., 0) == the float path's *valid (0*x = 0 for finite x).
    """
    from aaclip_tpu.data.transforms import CLIP_MEAN, CLIP_STD
    from aaclip_tpu.ops.augment import (joint_geometric_augment_device,
                                        joint_geometric_augment_device_u8)

    rng = np.random.default_rng(11)
    B, H = 4, 30
    u8 = rng.integers(0, 256, (B, 3, H, H), dtype=np.uint8)
    m8 = (rng.random((B, H, H)) > 0.8).astype(np.uint8)
    mean = jnp.asarray(CLIP_MEAN)[None, :, None, None]
    std = jnp.asarray(CLIP_STD)[None, :, None, None]
    # both paths jitted whole (normalize INSIDE the program, as in
    # device_cache._assemble) — outside jit the eager normalize lowers
    # differently and only agrees to ~2 ulp
    @jax.jit
    def floatpath(key, u8j, m8j):
        x = (u8j.astype(jnp.float32) / 255.0 - mean) / std
        return joint_geometric_augment_device(key, x,
                                              m8j.astype(jnp.float32))

    @jax.jit
    def packed(key, u8j, m8j):
        out_u8, out_m, valid = joint_geometric_augment_device_u8(
            key, u8j, m8j)
        xo = jnp.where(
            valid[:, None],
            (out_u8.astype(jnp.float32) / 255.0 - mean) / std, 0.0)
        return xo, out_m.astype(jnp.float32) * valid.astype(jnp.float32)

    for seed in range(6):
        key = jax.random.PRNGKey(seed)
        f_img, f_mask = floatpath(key, jnp.asarray(u8), jnp.asarray(m8))
        p_img, p_mask = packed(key, jnp.asarray(u8), jnp.asarray(m8))
        # signed zeros at fill positions may differ (where vs *0); compare
        # with +0.0 folding, and pin value equality exactly
        np.testing.assert_array_equal(np.asarray(p_img) + 0.0,
                                      np.asarray(f_img) + 0.0)
        assert np.abs(np.asarray(p_img) - np.asarray(f_img)).max() == 0.0
        np.testing.assert_array_equal(np.asarray(p_mask), np.asarray(f_mask))


def test_preprocess_train_uint8_mode(tmp_path):
    """Dataset uint8 mode ships post-jitter pixels whose device
    normalization equals the host-normalized float path exactly."""
    from PIL import Image

    from aaclip_tpu.data.transforms import (normalize_uint8_chw,
                                            preprocess_train)

    rng_img = np.random.default_rng(4)
    p = str(tmp_path / "img.png")
    Image.fromarray(rng_img.integers(0, 256, (40, 40, 3),
                                     dtype=np.uint8)).save(p)
    # same per-sample rng seed sequence in both modes -> same color jitter
    img_f, mask_f = preprocess_train(
        p, None, 32, 0, np.random.default_rng(7), text_stage=False,
        geometric=False)
    img_u, mask_u = preprocess_train(
        p, None, 32, 0, np.random.default_rng(7), text_stage=False,
        geometric=False, uint8=True)
    assert img_u.dtype == np.uint8 and mask_u.dtype == np.uint8
    np.testing.assert_array_equal(normalize_uint8_chw(img_u), img_f)


def test_train_cli_device_augment(tmp_path):
    """train.py --device_augment trains end-to-end on synthetic data."""
    import os
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from tests.synthetic import make_synthetic_dataset
    import train as train_cli

    data_root, meta_root = make_synthetic_dataset(str(tmp_path), img_px=64)
    old = dict(os.environ)
    os.environ["AACLIP_DATA"] = data_root
    os.environ["AACLIP_METADATA"] = meta_root
    try:
        save = str(tmp_path / "ckpt")
        train_cli.main([
            "--model_name", "tiny-test", "--img_size", "70",
            "--dataset", "MVTec", "--text_adapt_until", "1",
            "--image_adapt_until", "1", "--levels", "1", "2",
            "--num_workers", "2", "--save_path", save,
            "--training_mode", "full_shot", "--text_epoch", "1",
            "--image_epoch", "1", "--text_batch_size", "4",
            "--image_batch_size", "4", "--surgery_until_layer", "2",
            "--device_augment",
        ])
        assert os.path.isfile(os.path.join(save, "image_adapter_1.npz"))
        log = open(os.path.join(save, "train.log")).read()
        import re
        losses = [float(m) for m in re.findall(r"loss: ([\d.]+)", log)]
        assert losses and all(np.isfinite(losses))
    finally:
        os.environ.clear()
        os.environ.update(old)
