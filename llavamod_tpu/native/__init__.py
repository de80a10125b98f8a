"""Native (C++) host kernels with build-on-first-use + Python fallback.

The reference delegates its host-side hot paths to native code in external
deps (torch DataLoader workers, DeepSpeed C++ — SURVEY.md §2.9).  Here the
image preprocessing pipeline is a self-contained C++ translation unit
(image_prep.cpp) compiled with g++ on first use and loaded through ctypes;
callers fall back to the PIL/numpy path when no toolchain is available.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import sys
import threading
from typing import List, Optional

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "image_prep.cpp")
_LIB_PATH = os.path.join(_DIR, f"libimageprep-{sys.implementation.cache_tag}.so")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> Optional[str]:
    cmd = ["g++", "-O3", "-march=native", "-funroll-loops", "-shared",
           "-fPIC", "-std=c++17", "-pthread", _SRC, "-o", _LIB_PATH]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=300)
        return _LIB_PATH
    except (OSError, subprocess.SubprocessError) as exc:
        print(f"[native] image_prep build failed ({exc}); "
              "falling back to the PIL path", file=sys.stderr)
        return None


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if os.environ.get("LLAVAMOD_NO_NATIVE") == "1":
            return None
        path = _LIB_PATH
        if (not os.path.exists(path)
                or os.path.getmtime(path) < os.path.getmtime(_SRC)):
            path = _build()
            if path is None:
                return None
        try:
            lib = ctypes.CDLL(path)
        except OSError as exc:
            print(f"[native] dlopen failed ({exc})", file=sys.stderr)
            return None
        lib.llm_preprocess_batch.restype = ctypes.c_int
        lib.llm_preprocess_batch.argtypes = [
            ctypes.POINTER(ctypes.c_void_p),                # imgs
            ctypes.POINTER(ctypes.c_int),                   # hs
            ctypes.POINTER(ctypes.c_int),                   # ws
            ctypes.c_int, ctypes.c_int, ctypes.c_int,       # n, size, pad
            ctypes.c_char_p,                                # bg
            ctypes.POINTER(ctypes.c_float),                 # mean
            ctypes.POINTER(ctypes.c_float),                 # std
            ctypes.POINTER(ctypes.c_float),                 # out
            ctypes.c_int,                                   # threads
        ]
        _lib = lib
        return _lib


def is_available() -> bool:
    return _load() is not None


def preprocess_batch(images: List[np.ndarray], out_size: int, *,
                     pad_square: bool, background, mean, std,
                     num_threads: int = 0) -> Optional[np.ndarray]:
    """images: list of uint8 HWC arrays -> [N, 3, S, S] float32, or None if
    the native library is unavailable (caller falls back)."""
    lib = _load()
    if lib is None:
        return None
    n = len(images)
    imgs = [np.ascontiguousarray(im, dtype=np.uint8) for im in images]
    ptrs = (ctypes.c_void_p * n)(
        *[im.ctypes.data_as(ctypes.c_void_p) for im in imgs])
    hs = (ctypes.c_int * n)(*[im.shape[0] for im in imgs])
    ws = (ctypes.c_int * n)(*[im.shape[1] for im in imgs])
    bg = bytes(int(b) for b in background)
    mean_arr = (ctypes.c_float * 3)(*[float(x) for x in mean])
    std_arr = (ctypes.c_float * 3)(*[float(x) for x in std])
    out = np.empty((n, 3, out_size, out_size), np.float32)
    threads = num_threads or min(n, os.cpu_count() or 1)
    rc = lib.llm_preprocess_batch(
        ctypes.cast(ptrs, ctypes.POINTER(ctypes.c_void_p)), hs, ws,
        n, out_size, int(pad_square), bg, mean_arr, std_arr,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), threads)
    if rc != 0:
        return None
    return out
