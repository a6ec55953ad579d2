"""Separable resize operators expressed as small dense matrices.

On TPU a 1-D interpolation is a tiny matmul that rides the MXU, so every
resize here is ``A_rows @ X @ A_cols^T`` with precomputed host-side
matrices.  This also makes the operators exactly linear, which lets the
anomaly-map pipeline fold blur + upsample into a single matrix
(see ops/similarity.py).

``bilinear_matrix(align_corners=True)`` reproduces
``F.interpolate(mode='bilinear', align_corners=True)``
(reference forward_utils.py:211-213).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=64)
def bilinear_matrix(in_size: int, out_size: int, align_corners: bool = True) -> np.ndarray:
    """[out_size, in_size] 1-D bilinear interpolation matrix."""
    A = np.zeros((out_size, in_size), dtype=np.float32)
    if in_size == 1:
        A[:, 0] = 1.0
        return A
    for i in range(out_size):
        if align_corners:
            src = i * (in_size - 1) / (out_size - 1) if out_size > 1 else 0.0
        else:
            src = (i + 0.5) * in_size / out_size - 0.5
            src = min(max(src, 0.0), in_size - 1)
        i0 = int(np.floor(src))
        i0 = min(i0, in_size - 2)
        w = src - i0
        A[i, i0] += 1.0 - w
        A[i, i0 + 1] += w
    return A


def _cubic_weight(x: float, a: float) -> float:
    """Cubic convolution kernel."""
    x = abs(x)
    if x <= 1.0:
        return (a + 2.0) * x ** 3 - (a + 3.0) * x ** 2 + 1.0
    if x < 2.0:
        return a * x ** 3 - 5.0 * a * x ** 2 + 8.0 * a * x - 4.0 * a
    return 0.0


@functools.lru_cache(maxsize=64)
def bicubic_matrix(in_size: int, out_size: int, *,
                   antialias: bool = True) -> np.ndarray:
    """[out_size, in_size] 1-D bicubic matrix matching torch
    ``F.interpolate(mode='bicubic', align_corners=False)``.

    torch's two bicubic flavors differ even when upscaling:
    ``antialias=True`` (what the reference's pos-embed resize uses,
    model/model.py:414-420) is the PIL-style a=-0.5 kernel — out-of-range
    taps are DISCARDED and the remaining weights renormalized, and when
    DOWNSCALING the kernel support widens by the scale factor (the
    anti-aliasing itself; a fixed 4-tap window here would silently
    diverge from the reference for img_size below the native grid);
    ``antialias=False`` uses a=-0.75 with edge-clamped taps and a fixed
    4-tap window in both directions.  Both parity-tested vs torch in
    tests/test_model_parity.py.
    """
    A = np.zeros((out_size, in_size), dtype=np.float64)
    if antialias:
        a = -0.5
        scale = max(in_size / out_size, 1.0)
        support = 2.0 * scale
        invscale = 1.0 / scale
        for i in range(out_size):
            center = (i + 0.5) * in_size / out_size
            lo = max(0, int(center - support + 0.5))
            hi = min(in_size, int(center + support + 0.5))
            w = [_cubic_weight((j - center + 0.5) * invscale, a)
                 for j in range(lo, hi)]
            total = sum(w)
            for j, wj in zip(range(lo, hi), w):
                A[i, j] += wj / total
    else:
        a = -0.75
        for i in range(out_size):
            src = (i + 0.5) * in_size / out_size - 0.5
            i0 = int(np.floor(src))
            frac = src - i0
            for t in range(-1, 3):
                A[i, min(max(i0 + t, 0), in_size - 1)] += \
                    _cubic_weight(t - frac, a)
    return A.astype(np.float32)


def resize_bicubic_2d(x: np.ndarray, out_hw: tuple[int, int],
                      antialias: bool = True) -> np.ndarray:
    """Host-side bicubic resize of the last two axes (numpy, exact torch
    semantics for upsampling)."""
    Ah = bicubic_matrix(x.shape[-2], out_hw[0], antialias=antialias).astype(np.float64)
    Aw = bicubic_matrix(x.shape[-1], out_hw[1], antialias=antialias).astype(np.float64)
    y = np.einsum("Oh,...hw->...Ow", Ah, x.astype(np.float64))
    y = np.einsum("Pw,...Ow->...OP", Aw, y)
    return y.astype(np.float32)


def resize_bilinear_2d(x: jax.Array, out_hw: tuple[int, int],
                       align_corners: bool = True) -> jax.Array:
    """Bilinear-resize the last two axes of ``x`` via two matmuls."""
    h, w = x.shape[-2], x.shape[-1]
    oh, ow = out_hw
    Ah = jnp.asarray(bilinear_matrix(h, oh, align_corners))
    Aw = jnp.asarray(bilinear_matrix(w, ow, align_corners))
    y = jnp.einsum("Oh,...hw->...Ow", Ah, x, preferred_element_type=jnp.float32, precision="highest")
    y = jnp.einsum("Pw,...Ow->...OP", Aw, y, preferred_element_type=jnp.float32, precision="highest")
    return y
