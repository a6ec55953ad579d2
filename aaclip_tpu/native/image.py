"""Python bindings for the native decode+resize kernel.

Bit-exact replacements for the eval input pipeline's
PIL decode -> PIL resize -> CHW steps (data/transforms.py); callers fall
back to PIL when the library is unavailable or the file's format/layout is
one the kernel punts on (rc != 0).  The ctypes call releases the GIL, so
BatchLoader workers decode truly in parallel.
"""

from __future__ import annotations

import ctypes
import os
from typing import Optional

import numpy as np

from aaclip_tpu.native.build import load_image_lib


def image_native_available() -> bool:
    return load_image_lib() is not None


def load_rgb_resize_chw(path: str, size: int) -> Optional[np.ndarray]:
    """Decode + PIL-exact bicubic resize -> uint8 [3, size, size], or None
    (caller falls back to PIL)."""
    lib = load_image_lib()
    if lib is None:
        return None
    out = np.empty((3, size, size), np.uint8)
    rc = lib.load_rgb_resize_chw(
        os.fsencode(path), ctypes.c_int(size),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
    return out if rc == 0 else None


def load_gray_resize_nearest(path: str, size: int) -> Optional[np.ndarray]:
    """Decode + grayscale + PIL-exact nearest resize -> uint8 [size, size]
    (raw values, caller binarizes), or None."""
    lib = load_image_lib()
    if lib is None:
        return None
    out = np.empty((size, size), np.uint8)
    rc = lib.load_gray_resize_nearest(
        os.fsencode(path), ctypes.c_int(size),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
    return out if rc == 0 else None
