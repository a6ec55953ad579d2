"""On-device joint geometric augmentation (training input pipeline).

The reference augments on the host per sample (torchvision transforms on
the stacked image+mask tensor, dataset/__init__.py:30-39,89-94); the host
path here (data/transforms.joint_geometric_augment) mirrors it exactly.
This module is the TPU-native alternative: the SAME transform sequence —
RandomRotation(30) p=0.5 -> RandomAffine(translate 0.15, integer offsets)
p=0.5 -> H/V flips p=0.5, nearest resampling, zero fill — applied to the
whole batch on device with jax.random, so large data-parallel batches do
not serialize augmentation on host CPUs.

Parity: given identical transform parameters, the device output is
bit-identical to the host `_affine_nearest` + flips pipeline (same
inverse-mapped nearest gather, same rint rounding, two separate resamples
for rotation and translation exactly like torchvision applies them) —
asserted by tests/test_augment_device.py.  The random STREAM differs from
the host path (jax.random vs numpy Generator); both draw the same
distributions (docs/PARITY.md, intentional deviation 3).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _nearest_affine_one(chans: jax.Array, angle_deg: jax.Array,
                        ty: jax.Array, tx: jax.Array) -> jax.Array:
    """Inverse-mapped nearest affine on [C, H, W] — the jnp twin of
    data/transforms._affine_nearest (rotation about center + translation,
    zero fill).  angle 0 with zero offsets is an exact identity."""
    C, H, W = chans.shape
    cy, cx = (H - 1) / 2.0, (W - 1) / 2.0
    a = jnp.deg2rad(angle_deg)
    cos_a, sin_a = jnp.cos(a), jnp.sin(a)
    ys, xs = jnp.mgrid[0:H, 0:W]
    y0 = ys.astype(jnp.float32) - ty - cy
    x0 = xs.astype(jnp.float32) - tx - cx
    src_x = cos_a * x0 - sin_a * y0 + cx
    src_y = sin_a * x0 + cos_a * y0 + cy
    sx = jnp.rint(src_x).astype(jnp.int32)
    sy = jnp.rint(src_y).astype(jnp.int32)
    valid = (sx >= 0) & (sx < W) & (sy >= 0) & (sy < H)
    sx = jnp.clip(sx, 0, W - 1)
    sy = jnp.clip(sy, 0, H - 1)
    return chans[:, sy, sx] * valid[None].astype(chans.dtype)


def _draw_geom_params(key: jax.Array, H: int, W: int):
    """The pipeline's random draws, in the host path's order (rotation
    gate+angle, translate gate+offsets, hflip, vflip)."""
    k = jax.random.split(key, 7)
    rot = jax.random.uniform(k[0]) < 0.5
    angle = jnp.where(rot, jax.random.uniform(k[1], minval=-30.0,
                                              maxval=30.0), 0.0)
    trans = jax.random.uniform(k[2]) < 0.5
    tx = jnp.rint(jax.random.uniform(k[3], minval=-0.15 * W, maxval=0.15 * W))
    ty = jnp.rint(jax.random.uniform(k[4], minval=-0.15 * H, maxval=0.15 * H))
    tx = jnp.where(trans, tx, 0.0)
    ty = jnp.where(trans, ty, 0.0)
    hflip = jax.random.uniform(k[5]) < 0.5
    vflip = jax.random.uniform(k[6]) < 0.5
    return angle, ty, tx, hflip, vflip


def _fused_geom_indices(angle: jax.Array, ty: jax.Array, tx: jax.Array,
                        hflip: jax.Array, vflip: jax.Array, H: int, W: int):
    """(sy, sx, valid) of the COMPOSED pipeline rotation -> integer
    translation -> hflip -> vflip, index-identical to applying the four
    stages sequentially.

    Why composition is EXACT (not an approximation): the only rounding in
    the whole pipeline is the rotation's ``rint`` — the translation
    offsets are pre-rounded integers (so ``y - ty`` needs no rounding)
    and the flips are pure index reversals, so chasing an output pixel
    back through flips and translation lands on integer coordinates at
    which the rotation stage's own (sy, sx, valid) can be read directly.
    One gather instead of two + two reversal passes: the 2-D dynamic
    gather is ~all of the augment cost on TPU (288 ms/batch-32 measured
    -> ~145 ms; tools/microbench_augment.py)."""
    ys, xs = jnp.mgrid[0:H, 0:W]
    ys = ys.astype(jnp.float32)
    xs = xs.astype(jnp.float32)
    # flips run LAST in the pipeline, so their output-coordinate remap is
    # applied FIRST when chasing indices backwards
    xs = jnp.where(hflip, (W - 1) - xs, xs)
    ys = jnp.where(vflip, (H - 1) - ys, ys)
    # translation stage: trans[y, x] = rot[y - ty, x - tx], zero outside
    yt = ys - ty
    xt = xs - tx
    valid_t = (yt >= 0) & (yt < H) & (xt >= 0) & (xt < W)
    yt = jnp.clip(yt, 0, H - 1)
    xt = jnp.clip(xt, 0, W - 1)
    # rotation stage evaluated at the (integer) translated coordinates —
    # identical arithmetic to _nearest_affine_one
    cy, cx = (H - 1) / 2.0, (W - 1) / 2.0
    a = jnp.deg2rad(angle)
    cos_a, sin_a = jnp.cos(a), jnp.sin(a)
    y0 = yt - cy
    x0 = xt - cx
    src_x = cos_a * x0 - sin_a * y0 + cx
    src_y = sin_a * x0 + cos_a * y0 + cy
    sx = jnp.rint(src_x).astype(jnp.int32)
    sy = jnp.rint(src_y).astype(jnp.int32)
    valid_r = (sx >= 0) & (sx < W) & (sy >= 0) & (sy < H)
    sx = jnp.clip(sx, 0, W - 1)
    sy = jnp.clip(sy, 0, H - 1)
    return sy, sx, valid_t & valid_r


def _augment_one(key: jax.Array, img: jax.Array, mask: jax.Array):
    """One sample: img [3, H, W], mask [H, W] — the fused one-gather form
    (bit-identical to the sequential stages; see _fused_geom_indices)."""
    H, W = mask.shape
    stacked = jnp.concatenate([img, mask[None].astype(img.dtype)], axis=0)
    angle, ty, tx, hflip, vflip = _draw_geom_params(key, H, W)
    sy, sx, valid = _fused_geom_indices(angle, ty, tx, hflip, vflip, H, W)
    out = stacked[:, sy, sx] * valid[None].astype(stacked.dtype)
    return out[:3], out[3].astype(mask.dtype)


def joint_geometric_augment_device(key: jax.Array, images: jax.Array,
                                   masks: jax.Array):
    """Batch form: images [B, 3, H, W], masks [B, H, W]; independent
    per-sample keys.  jittable; typically wrapped in one jax.jit at the
    top of the training step pipeline."""
    keys = jax.random.split(key, images.shape[0])
    return jax.vmap(_augment_one)(keys, images, masks)


def _augment_one_u8_packed(key: jax.Array, img_u8: jax.Array,
                           mask_u8: jax.Array):
    """One sample, uint8 inputs, PACKED gather: r/g/b/mask bytes packed
    into one uint32 per pixel so the geometric gather moves 1/4 the
    elements of the 4-plane float32 form.  Returns
    ``(aug_img_u8 [3,H,W], aug_mask_u8 [H,W], valid [H,W] bool)`` — the
    caller normalizes AFTER the gather and applies ``valid``; elementwise
    ops commute with gathers, so ``where(valid, normalize(out_u8), 0)``
    is bit-identical to the normalize-then-gather float path
    (test_packed_augment_matches_float_path)."""
    H, W = mask_u8.shape
    packed = (img_u8[0].astype(jnp.uint32)
              | (img_u8[1].astype(jnp.uint32) << 8)
              | (img_u8[2].astype(jnp.uint32) << 16)
              | (mask_u8.astype(jnp.uint32) << 24))
    angle, ty, tx, hflip, vflip = _draw_geom_params(key, H, W)
    sy, sx, valid = _fused_geom_indices(angle, ty, tx, hflip, vflip, H, W)
    g = jnp.take(packed.reshape(-1), (sy * W + sx).reshape(-1)).reshape(H, W)
    out = jnp.stack([g & 0xFF, (g >> 8) & 0xFF, (g >> 16) & 0xFF],
                    axis=0).astype(jnp.uint8)
    return out, ((g >> 24) & 0xFF).astype(jnp.uint8), valid


def joint_geometric_augment_device_u8(key: jax.Array, images_u8: jax.Array,
                                      masks_u8: jax.Array):
    """Batch form of the packed-gather augment: [B, 3, H, W] uint8 +
    [B, H, W] uint8 -> (aug uint8 images, aug uint8 masks, valid bool).
    Draws the SAME per-sample random stream as
    joint_geometric_augment_device, and selects the same source pixels —
    only the gathered payload changes (packed bytes vs normalized
    floats).  Normalize after the gather with
    ``where(valid, (u8/255 - mean)/std, 0)`` for bit-identical results to
    the float path."""
    keys = jax.random.split(key, images_u8.shape[0])
    return jax.vmap(_augment_one_u8_packed)(keys, images_u8, masks_u8)


def _pil_gray(img_u8f: jax.Array) -> jax.Array:
    """PIL ``convert("L")`` on [3, H, W] float-held uint8 values:
    ``(R*19595 + G*38470 + B*7471 + 0x8000) >> 16`` (ITU-R 601-2 in
    16.16 fixed point — verified bit-exact against Pillow)."""
    r = img_u8f[0].astype(jnp.int32)
    g = img_u8f[1].astype(jnp.int32)
    b = img_u8f[2].astype(jnp.int32)
    return ((r * 19595 + g * 38470 + b * 7471 + 0x8000) >> 16).astype(
        jnp.float32)


def _pil_blend(base: jax.Array, img: jax.Array, f: jax.Array) -> jax.Array:
    """PIL ``Image.blend(degenerate, image, factor)`` on uint8 values held
    as float32: float math, TRUNCATE toward zero, clip to [0, 255]
    (probed against Pillow: truncation, not rounding)."""
    return jnp.floor(jnp.clip(base + f * (img - base), 0.0, 255.0))


def jitter_chain(img_u8: jax.Array, fb: jax.Array, fc: jax.Array,
                 fs: jax.Array) -> jax.Array:
    """Deterministic PIL ImageEnhance chain on one [3, H, W] uint8 image:
    Brightness(fb) -> Contrast(fc) -> Color(fs)
    (data/transforms.color_jitter's fixed order).  Each factor of 1.0 is
    an exact identity through the blend (integers <= 382 are exact in
    float32), so gating via a ``where`` on the factor matches skipping
    the enhancer entirely."""
    x = img_u8.astype(jnp.float32)
    # brightness: blend with black
    x = _pil_blend(jnp.float32(0.0), x, fb)
    # contrast: blend with the solid gray at int(mean(L) + 0.5), where L
    # is recomputed from the CURRENT (post-brightness) image — PIL
    # constructs each enhancer from the previous step's output
    mean = jnp.floor(jnp.mean(_pil_gray(x)) + 0.5)
    x = _pil_blend(mean, x, fc)
    # saturation ("Color"): blend with the per-pixel grayscale
    x = _pil_blend(_pil_gray(x)[None], x, fs)
    return x.astype(jnp.uint8)


def _jitter_one(key: jax.Array, img_u8: jax.Array, strength: float,
                p: float) -> jax.Array:
    """One image: each enhancer gated at probability ``p`` with factor
    U[1-strength, 1+strength] (host color_jitter's distribution)."""
    k = jax.random.split(key, 6)

    def factor(kg, kf):
        f = jax.random.uniform(kf, minval=1.0 - strength,
                               maxval=1.0 + strength)
        return jnp.where(jax.random.uniform(kg) < p, f, 1.0)

    return jitter_chain(img_u8, factor(k[0], k[1]), factor(k[2], k[3]),
                        factor(k[4], k[5]))


def color_jitter_device(key: jax.Array, images_u8: jax.Array,
                        strength: float = 0.5, p: float = 0.7) -> jax.Array:
    """Batched device twin of data/transforms.color_jitter: [B, 3, H, W]
    uint8 -> uint8, independent per-sample keys.  Bit-exact to Pillow for
    dyadic factors (tests/test_augment_device.py); for arbitrary factors
    PIL's C float truncation can differ by 1 LSB at truncation
    boundaries.  Same distribution as the host path, different RNG stream
    (docs/PARITY.md intentional deviation 3 — the device_augment rubric).
    """
    keys = jax.random.split(key, images_u8.shape[0])
    return jax.vmap(lambda kk, im: _jitter_one(kk, im, strength, p))(
        keys, images_u8)


def make_device_augment(uint8_inputs: bool = False):
    """jitted (key, images, masks) -> (float images, float masks).

    ``uint8_inputs=True``: images arrive as raw uint8 pixels and masks as
    uint8 {0,1}.  The geometric augmentation runs FIRST as a packed-uint32
    gather on the raw bytes (1/4 the gathered elements), and CLIP
    normalization runs AFTER on the gathered result — integer gathers
    commute exactly with the per-channel affine normalize, so this is
    bit-identical on the CPU test backend to the host op order (normalize,
    then augment with zero fill in normalized space, reference
    dataset/__init__.py:52-62; test_packed_augment_matches_float_path) and
    covered by the <=2 ulp device_augment rubric on TPU, while
    host->device transfer drops 4x — the training-side twin of the eval
    path's fused uint8 patch embed (ops/preprocess.py).
    """
    if not uint8_inputs:
        return jax.jit(joint_geometric_augment_device)

    from aaclip_tpu.data.transforms import CLIP_MEAN, CLIP_STD

    mean = jnp.asarray(CLIP_MEAN)[None, :, None, None]
    std = jnp.asarray(CLIP_STD)[None, :, None, None]

    def run(key, images_u8, masks_u8):
        # packed uint32 gather + post-gather normalize: bit-identical to
        # normalize-then-augment (test_packed_augment_matches_float_path)
        out_u8, out_m, valid = joint_geometric_augment_device_u8(
            key, images_u8, masks_u8)
        images = jnp.where(
            valid[:, None],
            (out_u8.astype(jnp.float32) / 255.0 - mean) / std, 0.0)
        return images, out_m.astype(jnp.float32) * valid.astype(jnp.float32)

    return jax.jit(run)
