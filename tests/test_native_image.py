"""Native decode+resize kernel vs the PIL reference path — the native fast
path must be BIT-EXACT (it replaces PIL decode -> PIL resample -> CHW in
the eval pipeline; reference transform chain: dataset/__init__.py:44-66).

The C++ kernel reimplements Pillow's fixed-point resample schemes
(bicubic two-pass at PRECISION_BITS=22; nearest via incremental-double
affine) and decodes through the same libjpeg/libpng Pillow wraps.
"""

import os
import tempfile

import numpy as np
import pytest
from PIL import Image

from aaclip_tpu.data import transforms as T
from aaclip_tpu.native.image import (
    image_native_available,
    load_gray_resize_nearest,
    load_rgb_resize_chw,
)

pytestmark = pytest.mark.skipif(
    not image_native_available(), reason="native image kernel unavailable")


@pytest.fixture(scope="module")
def tmpdir():
    with tempfile.TemporaryDirectory() as d:
        yield d


def _pil_rgb_chw(path, size):
    pil = Image.open(path).convert("RGB").resize((size, size), Image.BICUBIC)
    return np.asarray(pil, np.uint8).transpose(2, 0, 1)


@pytest.mark.parametrize("shape", [(64, 64), (100, 83), (37, 41), (517, 300)])
@pytest.mark.parametrize("ext", ["png", "jpg"])
def test_rgb_decode_resize_bit_exact(tmpdir, shape, ext):
    """PNG and JPEG, up- and down-scaling: native == PIL byte-for-byte."""
    rng = np.random.default_rng(hash(shape) % 2**32)
    a = rng.integers(0, 256, (*shape, 3), dtype=np.uint8)
    p = os.path.join(tmpdir, f"img_{shape[0]}x{shape[1]}.{ext}")
    Image.fromarray(a).save(p, **({"quality": 90} if ext == "jpg" else {}))
    for size in (70, 518, 33):
        got = load_rgb_resize_chw(p, size)
        assert got is not None
        np.testing.assert_array_equal(got, _pil_rgb_chw(p, size))


@pytest.mark.parametrize("mode", ["L", "RGBA", "P", "gray-as-rgb"])
def test_png_layout_variants(tmpdir, mode):
    """Alpha-drop, palette expansion, and gray replication must match PIL's
    convert("RGB") semantics exactly."""
    rng = np.random.default_rng(7)
    a = rng.integers(0, 256, (48, 56, 3), dtype=np.uint8)
    if mode == "L":
        img = Image.fromarray(a[..., 0], "L")
    elif mode == "RGBA":
        rgba = np.concatenate(
            [a, rng.integers(0, 256, (48, 56, 1), dtype=np.uint8)], -1)
        img = Image.fromarray(rgba, "RGBA")
    elif mode == "P":
        img = Image.fromarray(a).convert("P", palette=Image.ADAPTIVE)
    else:
        img = Image.fromarray(np.stack([a[..., 0]] * 3, -1))
    p = os.path.join(tmpdir, f"v_{mode}.png")
    img.save(p)
    got = load_rgb_resize_chw(p, 50)
    assert got is not None
    np.testing.assert_array_equal(got, _pil_rgb_chw(p, 50))


def test_mask_nearest_bit_exact(tmpdir):
    rng = np.random.default_rng(3)
    for shape in [(64, 64), (700, 500), (33, 47)]:
        m = (rng.random(shape) > 0.7).astype(np.uint8) * 255
        p = os.path.join(tmpdir, f"m_{shape[0]}.png")
        Image.fromarray(m, "L").save(p)
        for size in (70, 518):
            got = load_gray_resize_nearest(p, size)
            want = np.asarray(
                Image.open(p).convert("L").resize((size, size), Image.NEAREST))
            np.testing.assert_array_equal(got, want)


def test_rgb_mask_luminance_matches_pil(tmpdir):
    """RGB-stored masks go through PIL's exact L = (R*19595 + G*38470 +
    B*7471 + 0x8000) >> 16 conversion."""
    rng = np.random.default_rng(5)
    m = rng.integers(0, 256, (40, 40, 3), dtype=np.uint8)
    p = os.path.join(tmpdir, "mrgb.png")
    Image.fromarray(m).save(p)
    got = load_gray_resize_nearest(p, 40)
    want = np.asarray(Image.open(p).convert("L").resize((40, 40), Image.NEAREST))
    np.testing.assert_array_equal(got, want)


def test_unsupported_format_falls_back(tmpdir):
    """BMP is not handled natively; the wrapper returns None and the
    transforms helper must still produce the PIL result."""
    rng = np.random.default_rng(9)
    a = rng.integers(0, 256, (32, 32, 3), dtype=np.uint8)
    p = os.path.join(tmpdir, "x.bmp")
    Image.fromarray(a).save(p)
    assert load_rgb_resize_chw(p, 20) is None
    got = T.load_rgb_chw(p, 20, uint8=True)
    np.testing.assert_array_equal(got, _pil_rgb_chw(p, 20))


def test_preprocess_test_native_equals_pil(tmpdir, monkeypatch):
    """End-to-end: preprocess_test output is identical with the native
    kernel force-disabled (AACLIP_NO_NATIVE honored via fresh state)."""
    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, (90, 60, 3), dtype=np.uint8)
    msk = (rng.random((90, 60)) > 0.6).astype(np.uint8) * 255
    ip = os.path.join(tmpdir, "e2e.png")
    mp = os.path.join(tmpdir, "e2e_mask.png")
    Image.fromarray(img).save(ip)
    Image.fromarray(msk, "L").save(mp)

    for uint8 in (False, True):
        native = T.preprocess_test(ip, mp, 70, label=1, uint8=uint8)
        # PIL path, bypassing the native kernel
        pil_img = (T.to_uint8_chw if uint8 else T.to_normalized_chw)(
            T.resize_image(T.load_image_rgb(ip), 70))
        pil_mask = T.binarize_mask(T.resize_mask(T.load_mask(mp), 70))
        np.testing.assert_array_equal(native[0], pil_img)
        np.testing.assert_array_equal(native[1], pil_mask)
