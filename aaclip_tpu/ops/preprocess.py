"""Fused on-device image preprocessing.

The reference normalizes images on the host (torchvision Normalize,
dataset/__init__.py:56-62) and ships float32 tensors to the device.  Here
the CLIP mean/std normalization is FOLDED INTO the patch-embedding matmul:

    patchify((x/255 - m)/s) @ W  ==  patchify(x) @ W' + b'
    with  W'[(c,ky,kx), :] = W[(c,ky,kx), :] / (255 * s_c)
    and   b'[:] = - sum_{c,ky,kx} (m_c / s_c) * W[(c,ky,kx), :]

so the device consumes raw uint8 pixels — 4x less host->device transfer —
and normalization costs zero extra passes (it rides the MXU matmul).
Exact up to fp32 rounding (~1e-6 relative).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from aaclip_tpu.data.transforms import CLIP_MEAN, CLIP_STD


def fold_normalization_into_conv1(conv_w, patch_size: int,
                                  mean=CLIP_MEAN, std=CLIP_STD
                                  ) -> Tuple[jax.Array, jax.Array]:
    """(W', b') such that uint8 patches @ W' + b' equals normalized-float
    patches @ W.  ``conv_w``: [3*p*p, width] with (c, ky, kx) ordering."""
    w = np.asarray(conv_w, np.float32)
    pp = patch_size * patch_size
    width = w.shape[1]
    w3 = w.reshape(3, pp, width)
    scale = (1.0 / (255.0 * np.asarray(std, np.float32)))[:, None, None]
    w_folded = (w3 * scale).reshape(3 * pp, width)
    shift = (np.asarray(mean, np.float32) / np.asarray(std, np.float32))[:, None, None]
    b_folded = -(w3 * shift).sum(axis=(0, 1))
    return jnp.asarray(w_folded), jnp.asarray(b_folded)


def extract_patches(x: jax.Array, patch: int) -> jax.Array:
    """[B, C, H, W] -> [B, (H/p)*(W/p), C*p*p] with (c, ky, kx) ordering
    per patch.  The ONE implementation of the patch-flattening layout —
    it must agree with the checkpoint converter's conv-kernel reshape
    (core/params.py) and the normalization fold above, so both the float
    (models/vit.patchify) and uint8-fused paths route through it."""
    B, C, H, W = x.shape
    gy, gx = H // patch, W // patch
    x = x.reshape(B, C, gy, patch, gx, patch)
    return x.transpose(0, 2, 4, 1, 3, 5).reshape(B, gy * gx,
                                                 C * patch * patch)


def patchify_uint8(images_u8: jax.Array, w_folded: jax.Array,
                   b_folded: jax.Array, patch: int,
                   compute_dtype=jnp.bfloat16,
                   precision=None) -> jax.Array:
    """[B, 3, H, W] uint8 -> [B, (H/p)*(W/p), width] normalized patch
    embeddings, normalization fused into the matmul."""
    x = extract_patches(images_u8, patch).astype(compute_dtype)
    y = jnp.dot(x, w_folded.astype(compute_dtype),
                preferred_element_type=jnp.float32, precision=precision)
    return y + b_folded.astype(jnp.float32)
