"""Python bindings for the native metrics kernel (ctypes, numpy fallback
handled by callers)."""

from __future__ import annotations

import ctypes
from typing import Optional, Tuple

import numpy as np

from aaclip_tpu.native.build import load


def native_available() -> bool:
    return load() is not None


def auroc_ap(labels: np.ndarray, scores: np.ndarray) -> Optional[Tuple[float, float]]:
    """(auroc, ap) via the native kernel, or None when unavailable."""
    lib = load()
    if lib is None:
        return None
    # float64 end to end: metrics_eval normalizes in float64, and casting
    # to float32 here would merge sub-f32-ulp score differences into ties
    # the numpy/sklearn paths keep distinct
    scores = np.ascontiguousarray(scores.reshape(-1), np.float64)
    labels = np.ascontiguousarray(labels.reshape(-1) != 0, np.uint8)
    a = ctypes.c_double()
    p = ctypes.c_double()
    rc = lib.auroc_ap(
        scores.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        labels.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.c_int64(scores.size), ctypes.byref(a), ctypes.byref(p))
    if rc != 0:
        return float("nan"), float("nan")
    return a.value, p.value


def label_components(mask: np.ndarray) -> Optional[Tuple[np.ndarray, int]]:
    """(labels [H, W] int32, n_components) via the native kernel, or None."""
    lib = load()
    if lib is None:
        return None
    mask = np.ascontiguousarray(mask != 0, np.uint8)
    h, w = mask.shape
    out = np.zeros((h, w), np.int32)
    n = lib.label_components(
        mask.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.c_int32(h), ctypes.c_int32(w),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
    return out, int(n)
