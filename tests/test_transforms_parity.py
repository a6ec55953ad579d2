"""Spot-parity of the augmentation numerics vs torchvision semantics.

torchvision itself is not installed in this image, so the oracles here are
direct transcriptions of its two backends, checked against the real kernels
they wrap:

* geometric (the reference applies RandomRotation/RandomAffine to the
  stacked 4-channel TENSOR, dataset/__init__.py:30-39,89-94, so the
  torchvision tensor backend applies): `_get_inverse_affine_matrix` +
  `_gen_affine_grid` transcribed from torchvision's source, sampled with
  torch's actual `grid_sample(mode="nearest", padding_mode="zeros",
  align_corners=False)` kernel — exactly what F.rotate/F.affine execute.
* color (the reference applies ColorJitter to PIL images before ToTensor,
  dataset/__init__.py:44-52, so the PIL backend applies): torchvision's PIL
  path IS `PIL.ImageEnhance` (functional_pil.adjust_* one-liners), which is
  what `transforms.color_jitter` calls; the oracle below re-derives the
  enhancement arithmetic (blend against degenerate image) in numpy and
  allows the documented <=1-LSB uint8 rounding fuzz.
"""

import math

import numpy as np
import pytest
import torch
from PIL import Image, ImageEnhance

from aaclip_tpu.data.transforms import _affine_nearest


# ---- torchvision tensor-backend transcription ------------------------------

def _get_inverse_affine_matrix(center, angle, translate, scale, shear):
    # torchvision.transforms.functional._get_inverse_affine_matrix
    rot = math.radians(angle)
    sx = math.radians(shear[0])
    sy = math.radians(shear[1])
    cx, cy = center
    tx, ty = translate
    a = math.cos(rot - sy) / math.cos(sy)
    b = -math.cos(rot - sy) * math.tan(sx) / math.cos(sy) - math.sin(rot)
    c = math.sin(rot - sy) / math.cos(sy)
    d = -math.sin(rot - sy) * math.tan(sx) / math.cos(sy) + math.cos(rot)
    matrix = [d, -b, 0.0, -c, a, 0.0]
    matrix = [x / scale for x in matrix]
    matrix[2] += matrix[0] * (-cx - tx) + matrix[1] * (-cy - ty)
    matrix[5] += matrix[3] * (-cx - tx) + matrix[4] * (-cy - ty)
    matrix[2] += cx
    matrix[5] += cy
    return matrix


def _gen_affine_grid(theta, w, h, ow, oh):
    # torchvision.transforms._functional_tensor._gen_affine_grid
    d = 0.5
    base_grid = torch.empty(1, oh, ow, 3)
    x_grid = torch.linspace(-ow * 0.5 + d, ow * 0.5 + d - 1, steps=ow)
    base_grid[..., 0].copy_(x_grid)
    y_grid = torch.linspace(-oh * 0.5 + d, oh * 0.5 + d - 1,
                            steps=oh).unsqueeze_(-1)
    base_grid[..., 1].copy_(y_grid)
    base_grid[..., 2].fill_(1)
    rescaled_theta = theta.transpose(1, 2) / torch.tensor([0.5 * w, 0.5 * h])
    output_grid = base_grid.view(1, oh * ow, 3).bmm(rescaled_theta)
    return output_grid.view(1, oh, ow, 2)


def _tv_tensor_affine(img: torch.Tensor, matrix) -> torch.Tensor:
    theta = torch.tensor(matrix, dtype=torch.float32).reshape(1, 2, 3)
    h, w = img.shape[-2:]
    grid = _gen_affine_grid(theta, w=w, h=h, ow=w, oh=h)
    return torch.nn.functional.grid_sample(
        img[None].float(), grid, mode="nearest", padding_mode="zeros",
        align_corners=False)[0]


def tv_rotate(img: torch.Tensor, angle: float) -> torch.Tensor:
    # F.rotate tensor path: center (0,0) in grid coords, angle negated
    m = _get_inverse_affine_matrix([0.0, 0.0], -angle, [0.0, 0.0], 1.0,
                                   [0.0, 0.0])
    return _tv_tensor_affine(img, m)


def tv_translate(img: torch.Tensor, tx: float, ty: float) -> torch.Tensor:
    # F.affine(angle=0, translate=(tx, ty)) tensor path
    m = _get_inverse_affine_matrix([0.0, 0.0], 0.0, [tx, ty], 1.0, [0.0, 0.0])
    return _tv_tensor_affine(img, m)


@pytest.mark.parametrize("hw", [(33, 33), (32, 32), (31, 37)])
@pytest.mark.parametrize("angle", [17.3, -29.999, 45.0, 90.0])
def test_rotation_matches_torchvision_tensor_backend(hw, angle):
    rng = np.random.default_rng(0)
    x = rng.random((4, *hw)).astype(np.float32)
    want = tv_rotate(torch.from_numpy(x), angle).numpy()
    got = _affine_nearest(x.copy(), angle, (0.0, 0.0))
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("txy", [(3, -5), (-7, 0), (4, 4)])
def test_integer_translate_matches_torchvision_tensor_backend(txy):
    # RandomAffine(translate=...) always rounds offsets to integers
    # (torchvision RandomAffine.get_params), so only integer shifts occur
    rng = np.random.default_rng(1)
    x = rng.random((4, 30, 40)).astype(np.float32)
    tx, ty = txy
    want = tv_translate(torch.from_numpy(x), tx, ty).numpy()
    got = _affine_nearest(x.copy(), 0.0, (float(ty), float(tx)))
    np.testing.assert_array_equal(got, want)
    # and an integer shift is exactly a roll-with-zero-fill
    want2 = np.zeros_like(x)
    ys, xs = np.mgrid[0:30, 0:40]
    sy, sx = ys - ty, xs - tx
    ok = (sy >= 0) & (sy < 30) & (sx >= 0) & (sx < 40)
    want2[:, ys[ok], xs[ok]] = x[:, sy[ok], sx[ok]]
    np.testing.assert_array_equal(got, want2)


# ---- ColorJitter (PIL backend) ---------------------------------------------

def _pil_gray_l(arr: np.ndarray) -> np.ndarray:
    # PIL RGB->L: (19595 R + 38470 G + 7471 B + 0x8000) >> 16
    a = arr.astype(np.int64)
    return (19595 * a[..., 0] + 38470 * a[..., 1] + 7471 * a[..., 2]
            + 0x8000) >> 16


def test_color_jitter_matches_enhance_arithmetic():
    """adjust_brightness/contrast/saturation (torchvision PIL backend ==
    ImageEnhance, which color_jitter calls) vs an independent numpy
    re-derivation of the enhancement arithmetic; <=1 LSB rounding fuzz."""
    rng = np.random.default_rng(2)
    arr = rng.integers(0, 256, (24, 24, 3), dtype=np.uint8)
    img = Image.fromarray(arr)

    for factor in (0.6, 1.4):
        # brightness: blend(black, img, f) = f * img
        got = np.asarray(ImageEnhance.Brightness(img).enhance(factor),
                         np.int64)
        want = np.clip(np.round(arr.astype(np.float64) * factor), 0, 255)
        assert np.abs(got - want).max() <= 1

        # contrast: blend(solid gray(mean of L), img, f)
        mean = int(_pil_gray_l(arr).mean() + 0.5)
        got = np.asarray(ImageEnhance.Contrast(img).enhance(factor), np.int64)
        want = np.clip(np.round(mean + factor * (arr.astype(np.float64) - mean)),
                       0, 255)
        assert np.abs(got - want).max() <= 1

        # saturation: blend(grayscale image, img, f)
        gray = _pil_gray_l(arr)[..., None].astype(np.float64)
        got = np.asarray(ImageEnhance.Color(img).enhance(factor), np.int64)
        want = np.clip(np.round(gray + factor * (arr.astype(np.float64) - gray)),
                       0, 255)
        assert np.abs(got - want).max() <= 1


def test_color_jitter_factor_distribution_and_order():
    """color_jitter draws each factor from U[0.5, 1.5] and applies
    brightness -> contrast -> saturation, each with p=0.7, mirroring the
    reference's three single-property ColorJitter RandomApply entries
    (dataset/__init__.py:44-52)."""
    from aaclip_tpu.data.transforms import color_jitter

    rng = np.random.default_rng(3)
    arr = np.full((8, 8, 3), 128, np.uint8)
    arr[..., 0] = 200  # give saturation something to do
    img = Image.fromarray(arr)

    # p=1 forces all three; replicate with the same RNG stream
    rng2 = np.random.default_rng(4)
    out = color_jitter(img, np.random.default_rng(4), p=1.1)
    expect = img
    for enh in (ImageEnhance.Brightness, ImageEnhance.Contrast,
                ImageEnhance.Color):
        assert rng2.random() < 1.1
        f = float(rng2.uniform(0.5, 1.5))
        assert 0.5 <= f <= 1.5
        expect = enh(expect).enhance(f)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(expect))

    # p=0 is the identity
    out0 = color_jitter(img, rng, p=0.0)
    np.testing.assert_array_equal(np.asarray(out0), arr)
