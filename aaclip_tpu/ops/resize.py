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
