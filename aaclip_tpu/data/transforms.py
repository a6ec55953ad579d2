"""Host-side image transforms (PIL + numpy), matching the reference's
torchvision pipeline (dataset/__init__.py:30-94):

* image: [ColorJitter(brightness/contrast/saturation 0.5) each p=0.7]
  (train, image-stage only) -> bicubic resize to img_size -> [0,1] tensor ->
  CLIP mean/std normalize;
* mask: nearest resize -> binarize (!= 0);
* joint geometric augmentation on the stacked [4, H, W] tensor:
  RandomRotation(30 deg) p=0.5, RandomAffine(translate 0.15) p=0.5,
  H/V flips p=0.5 — nearest resampling, zero fill, like torchvision
  defaults.

Randomness comes from an explicit numpy Generator so worker threads are
deterministic given (seed, epoch, index).
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import numpy as np
from PIL import Image, ImageEnhance

CLIP_MEAN = np.array([0.48145466, 0.4578275, 0.40821073], np.float32)
CLIP_STD = np.array([0.26862954, 0.26130258, 0.27577711], np.float32)


def load_image_rgb(path: str) -> Image.Image:
    return Image.open(path).convert("RGB")


def load_mask(path: str) -> Image.Image:
    return Image.open(path).convert("L")


def resize_image(img: Image.Image, size: int) -> Image.Image:
    return img.resize((size, size), Image.BICUBIC)


def resize_mask(mask: Image.Image, size: int) -> Image.Image:
    return mask.resize((size, size), Image.NEAREST)


def to_normalized_chw(img: Image.Image) -> np.ndarray:
    """PIL RGB -> [3, H, W] float32, CLIP-normalized."""
    x = np.asarray(img, np.float32) / 255.0
    x = (x - CLIP_MEAN) / CLIP_STD
    return np.ascontiguousarray(x.transpose(2, 0, 1))


def binarize_mask(mask: Image.Image) -> np.ndarray:
    """PIL L -> [1, H, W] float32 in {0, 1}."""
    m = (np.asarray(mask) != 0).astype(np.float32)
    return m[None]


def color_jitter(img: Image.Image, rng: np.random.Generator,
                 strength: float = 0.5, p: float = 0.7) -> Image.Image:
    """Brightness, contrast, saturation jitter, each independently applied
    with probability p, factor ~ U[1-strength, 1+strength] (torchvision
    ColorJitter semantics; enhancement order fixed b->c->s like the
    reference's transform list)."""
    for enhancer in (ImageEnhance.Brightness, ImageEnhance.Contrast,
                     ImageEnhance.Color):
        if rng.random() < p:
            factor = float(rng.uniform(1.0 - strength, 1.0 + strength))
            img = enhancer(img).enhance(factor)
    return img


def _affine_nearest(channels: np.ndarray, angle_deg: float,
                    translate: Tuple[float, float]) -> np.ndarray:
    """Nearest-neighbor inverse-mapped affine (rotation about center +
    translation), zero fill — torchvision F.affine/F.rotate semantics.

    channels: [C, H, W].
    """
    C, H, W = channels.shape
    cy, cx = (H - 1) / 2.0, (W - 1) / 2.0
    a = math.radians(angle_deg)
    cos_a, sin_a = math.cos(a), math.sin(a)
    ty, tx = translate
    ys, xs = np.mgrid[0:H, 0:W].astype(np.float32)
    # inverse map: undo translation, then rotate by -angle about the center
    y0 = ys - ty - cy
    x0 = xs - tx - cx
    # positive angle rotates counter-clockwise (torchvision convention)
    src_x = cos_a * x0 - sin_a * y0 + cx
    src_y = sin_a * x0 + cos_a * y0 + cy
    sx = np.rint(src_x).astype(np.int64)
    sy = np.rint(src_y).astype(np.int64)
    valid = (sx >= 0) & (sx < W) & (sy >= 0) & (sy < H)
    sx = np.clip(sx, 0, W - 1)
    sy = np.clip(sy, 0, H - 1)
    out = channels[:, sy, sx]
    out *= valid[None]
    return out


def joint_geometric_augment(img: np.ndarray, mask: np.ndarray,
                            rng: np.random.Generator) -> Tuple[np.ndarray, np.ndarray]:
    """Apply the reference's joint augmentations to image [3,H,W] and mask
    [1,H,W] together (dataset/__init__.py:30-39,89-94)."""
    stacked = np.concatenate([img, mask], axis=0)
    H, W = stacked.shape[-2:]
    angle = 0.0
    tx = ty = 0.0
    if rng.random() < 0.5:  # RandomRotation(30)
        angle = float(rng.uniform(-30.0, 30.0))
    if angle != 0.0:
        stacked = _affine_nearest(stacked, angle, (0.0, 0.0))
    if rng.random() < 0.5:  # RandomAffine(translate=(0.15, 0.15))
        tx = float(np.rint(rng.uniform(-0.15 * W, 0.15 * W)))
        ty = float(np.rint(rng.uniform(-0.15 * H, 0.15 * H)))
        stacked = _affine_nearest(stacked, 0.0, (ty, tx))
    if rng.random() < 0.5:  # horizontal flip
        stacked = stacked[:, :, ::-1]
    if rng.random() < 0.5:  # vertical flip
        stacked = stacked[:, ::-1, :]
    stacked = np.ascontiguousarray(stacked)
    return stacked[:3], stacked[3:4]


def to_uint8_chw(img: Image.Image) -> np.ndarray:
    """PIL RGB -> [3, H, W] uint8 (normalization deferred to the device's
    fused patch embed, ops/preprocess.py)."""
    return np.ascontiguousarray(
        np.asarray(img, np.uint8).transpose(2, 0, 1))


def normalize_uint8_chw(chw: np.ndarray) -> np.ndarray:
    """uint8 [3, H, W] -> float32 CLIP-normalized (same elementwise ops as
    ``to_normalized_chw``, so results are bitwise identical)."""
    x = chw.astype(np.float32) / 255.0
    return (x - CLIP_MEAN[:, None, None]) / CLIP_STD[:, None, None]


def load_rgb_chw(path: str, size: int, uint8: bool = False) -> np.ndarray:
    """Decode + bicubic resize -> [3, size, size] (uint8, or normalized
    float32), via the native kernel when available (bit-exact vs the PIL
    path — aaclip_tpu/native/fast_image.cc), PIL otherwise."""
    from aaclip_tpu.native.image import load_rgb_resize_chw

    chw = load_rgb_resize_chw(path, size)
    if chw is None:
        chw = to_uint8_chw(resize_image(load_image_rgb(path), size))
    return chw if uint8 else normalize_uint8_chw(chw)


def load_mask_binarized(path: str, size: int) -> np.ndarray:
    """Decode + nearest resize + binarize -> float32 [1, size, size], via
    the native kernel when available (bit-exact), PIL otherwise."""
    from aaclip_tpu.native.image import load_gray_resize_nearest

    m = load_gray_resize_nearest(path, size)
    if m is not None:
        return (m != 0).astype(np.float32)[None]
    return binarize_mask(resize_mask(load_mask(path), size))


def _mask_for(mask_path: Optional[str], img_size: int, label: int,
              dtype=np.float32) -> np.ndarray:
    """Ground-truth mask: binarized file for anomalous samples, zeros for
    normal ones.  An anomalous record WITHOUT a mask_path is malformed
    metadata and raises — the reference indexes ``meta['mask_path']``
    unconditionally and would crash too; a silent all-zero mask would
    instead corrupt the seg loss and pixel metrics (all benchmark jsonl
    records carry masks for label=1)."""
    if label:
        if not mask_path:
            raise ValueError(
                "anomalous sample (label=1) without a mask_path — "
                "malformed metadata record")
        return load_mask_binarized(mask_path, img_size).astype(dtype)
    return np.zeros((1, img_size, img_size), dtype)


def preprocess_test(img_path: str, mask_path: Optional[str], img_size: int,
                    label: int, uint8: bool = False) -> Tuple[np.ndarray, np.ndarray]:
    """Deterministic test-time transform (dataset/__init__.py:127-142).
    ``uint8=True`` skips host normalization (fused on device)."""
    img = load_rgb_chw(img_path, img_size, uint8=uint8)
    return img, _mask_for(mask_path, img_size, label)


def preprocess_train(img_path: str, mask_path: Optional[str], img_size: int,
                     label: int, rng: np.random.Generator,
                     text_stage: bool,
                     geometric: bool = True,
                     uint8: bool = False) -> Tuple[np.ndarray, np.ndarray]:
    """Training transform; ``text_stage=True`` skips color jitter
    (dataset/__init__.py:41-52).  ``geometric=False`` defers the joint
    geometric augmentation to the device (ops/augment.py); with
    ``uint8=True`` (device-augment transfer mode) the image ships as raw
    post-jitter pixels and the mask as uint8 {0,1} — normalization happens
    on device (same math to float roundoff, 4x less transfer)."""
    pil = load_image_rgb(img_path)
    if not text_stage:
        pil = color_jitter(pil, rng)
    if uint8:
        assert not geometric, "uint8 mode defers augmentation to the device"
        img = to_uint8_chw(resize_image(pil, img_size))
        return img, _mask_for(mask_path, img_size, label, np.uint8)
    img = to_normalized_chw(resize_image(pil, img_size))
    mask = _mask_for(mask_path, img_size, label)
    if not geometric:
        return img, mask
    return joint_geometric_augment(img, mask, rng)
