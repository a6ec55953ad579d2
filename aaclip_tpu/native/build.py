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
# ABI-versioned artifact names: bump the suffix whenever a C signature
# changes (v2 = auroc_ap takes double* scores) so a stale cached .so from
# an older tree can never be loaded and fed mismatched buffers (mtime
# checks alone are defeated by rsync -t / tar extraction)
_OUT = os.path.join(_DIR, "_build", "libfast_metrics_v2.so")
_IMG_SRC = os.path.join(_DIR, "fast_image.cc")
_IMG_OUT = os.path.join(_DIR, "_build", "libfast_image_v2.so")
_lock = threading.Lock()
_lib = None
_tried = False
_img_lib = None
_img_tried = False


def _compile(src: str, out: str, libs=(), force: bool = False) -> Optional[str]:
    if os.path.isfile(out) and not force:
        if not os.path.isfile(src):
            return out  # prebuilt artifact shipped without sources
        if os.path.getmtime(out) >= os.path.getmtime(src):
            return out
    if not os.path.isfile(src):
        return None
    os.makedirs(os.path.dirname(out), exist_ok=True)
    # compile to a temp name and rename into place: a g++ killed mid-link
    # (timeout, Ctrl-C, concurrent build) must never leave a truncated .so
    # whose fresh mtime caches it as valid forever
    tmp = f"{out}.tmp-{os.getpid()}"
    libflags = [f"-l{l}" for l in libs]
    cmd = [
        "g++", "-O3", "-std=c++17", "-shared", "-fPIC", "-fopenmp",
        "-D_GLIBCXX_PARALLEL", "-march=native", src, "-o", tmp, *libflags,
    ]
    try:
        try:
            subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        except (subprocess.SubprocessError, FileNotFoundError):
            # retry without native arch / openmp for maximal portability
            try:
                subprocess.run(
                    ["g++", "-O3", "-std=c++17", "-shared", "-fPIC", src,
                     "-o", tmp, *libflags],
                    check=True, capture_output=True, timeout=120)
            except (subprocess.SubprocessError, FileNotFoundError):
                return None
        os.replace(tmp, out)
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)
    return out


def build(force: bool = False) -> Optional[str]:
    return _compile(_SRC, _OUT, force=force)


def build_image(force: bool = False) -> Optional[str]:
    return _compile(_IMG_SRC, _IMG_OUT, libs=("jpeg", "png"), force=force)


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
        try:
            lib = ctypes.CDLL(path)
        except OSError:  # corrupt/foreign cached artifact: numpy fallback
            return None
        lib.auroc_ap.restype = ctypes.c_int
        lib.auroc_ap.argtypes = [
            ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_uint8),
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


def load_image_lib() -> Optional[ctypes.CDLL]:
    """The decode+resize kernel (fast_image.cc), or None (PIL fallback)."""
    global _img_lib, _img_tried
    with _lock:
        if _img_lib is not None or _img_tried:
            return _img_lib
        _img_tried = True
        if os.environ.get("AACLIP_NO_NATIVE"):
            return None
        path = build_image()
        if path is None:
            return None
        try:
            lib = ctypes.CDLL(path)
        except OSError:
            return None
        for fn in (lib.load_rgb_resize_chw, lib.load_gray_resize_nearest):
            fn.restype = ctypes.c_int
            fn.argtypes = [ctypes.c_char_p, ctypes.c_int,
                           ctypes.POINTER(ctypes.c_uint8)]
        _img_lib = lib
        return _img_lib


if __name__ == "__main__":
    out = build(force=True)
    print(out or "build failed")
    out = build_image(force=True)
    print(out or "image build failed")
