"""ctypes bindings for the native C++ batch WAV loader (native/wavio.cpp).

Builds the shared library on first use with g++ (no pybind11 in the image —
plain C ABI + ctypes).  Falls back cleanly when the toolchain or library is
unavailable: ``available()`` gates every call site, and BatchLoader's
``native=True`` degrades to the Python decode path.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Sequence, Tuple

import numpy as np

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_SRC = os.path.join(_REPO_ROOT, "native", "wavio.cpp")
_LIB_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "_native")
_LIB = os.path.join(_LIB_DIR, "libawmwav.so")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    os.makedirs(_LIB_DIR, exist_ok=True)
    cmd = [
        "g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-pthread",
        _SRC, "-o", _LIB,
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if os.path.exists(_SRC):
            stale = not os.path.exists(_LIB) or (
                os.path.getmtime(_SRC) > os.path.getmtime(_LIB)
            )
            # rebuild when the source is newer so a leftover library can
            # never shadow source fixes; keep a pre-existing lib only as a
            # fallback when the toolchain is missing
            if stale and not _build() and not os.path.exists(_LIB):
                return None
        if not os.path.exists(_LIB):
            return None
        try:
            lib = ctypes.CDLL(_LIB)
        except OSError:
            return None
        lib.awm_load_clips.restype = ctypes.c_long
        lib.awm_load_clips.argtypes = [
            ctypes.POINTER(ctypes.c_char_p),
            ctypes.c_long,
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_long,
            ctypes.c_int,
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_int),
        ]
        lib.awm_load_clip.restype = ctypes.c_long
        lib.awm_load_clip.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_long,
            ctypes.c_int,
        ]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def load_clips(
    paths: Sequence[str],
    clip_len: int = 16000,
    target_sr: int = 16000,
    n_threads: int = 8,
) -> Tuple[np.ndarray, np.ndarray]:
    """Decode a batch of WAV files -> ((n, clip_len) float32, (n,) ok mask).

    One C call; files are read/decoded/mono-mixed/resampled/padded by a
    std::thread pool.  Failed files leave zeros with ok=0 (skip-and-count,
    matching the reference's per-file try/except, ref: py/main14.py:1006-1009).
    """
    lib = _load()
    if lib is None:
        raise RuntimeError("native loader unavailable (g++ build failed?)")
    n = len(paths)
    out = np.zeros((n, clip_len), dtype=np.float32)
    ok = np.zeros(n, dtype=np.int32)
    arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    lib.awm_load_clips(
        arr,
        n,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        clip_len,
        target_sr,
        n_threads,
        ok.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
    )
    return out, ok.astype(bool)
