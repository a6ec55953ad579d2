"""Build + load the native metrics kernel (g++ -> shared lib -> ctypes).

``load()`` returns the ctypes library, compiling it on first use into
``aaclip_tpu/native/_build/``; returns None when no compiler is available
(callers fall back to the numpy implementations).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "fast_metrics.cc")
_OUT = os.path.join(_DIR, "_build", "libfast_metrics.so")
_lock = threading.Lock()
_lib = None
_tried = False


def build(force: bool = False) -> Optional[str]:
    if os.path.isfile(_OUT) and not force \
            and os.path.getmtime(_OUT) >= os.path.getmtime(_SRC):
        return _OUT
    os.makedirs(os.path.dirname(_OUT), exist_ok=True)
    cmd = [
        "g++", "-O3", "-std=c++17", "-shared", "-fPIC", "-fopenmp",
        "-D_GLIBCXX_PARALLEL", "-march=native", _SRC, "-o", _OUT,
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
    except (subprocess.SubprocessError, FileNotFoundError):
        # retry without native arch / openmp for maximal portability
        try:
            subprocess.run(
                ["g++", "-O3", "-std=c++17", "-shared", "-fPIC", _SRC,
                 "-o", _OUT],
                check=True, capture_output=True, timeout=120)
        except (subprocess.SubprocessError, FileNotFoundError):
            return None
    return _OUT


def load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if os.environ.get("AACLIP_NO_NATIVE"):
            return None
        path = build()
        if path is None:
            return None
        lib = ctypes.CDLL(path)
        lib.auroc_ap.restype = ctypes.c_int
        lib.auroc_ap.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int64, ctypes.POINTER(ctypes.c_double),
            ctypes.POINTER(ctypes.c_double),
        ]
        lib.label_components.restype = ctypes.c_int32
        lib.label_components.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int32, ctypes.c_int32,
            ctypes.POINTER(ctypes.c_int32),
        ]
        _lib = lib
        return _lib


if __name__ == "__main__":
    out = build(force=True)
    print(out or "build failed")
