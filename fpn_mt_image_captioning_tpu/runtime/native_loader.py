"""ctypes binding for the native C++ image loader (runtime/image_loader.cc).

Builds the shared object on first use (g++ -O3, linked against zlib) and caches
it next to the source. ``decode_batch`` decodes+resizes+normalizes a list of
image paths into one (N, S, S, 3) float32 array entirely in native code with a
thread pool — the framework's equivalent of the tf.data C++ input pipeline the
reference leans on (SURVEY.md §2 C4). Falls back gracefully: ``available()``
returns False when the toolchain or zlib is missing, and callers use PIL.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_SRC = os.path.join(os.path.dirname(os.path.abspath(__file__)), "image_loader.cc")
_SO = os.path.join(os.path.dirname(os.path.abspath(__file__)), "_image_loader.so")

_lock = threading.Lock()
_lib = None
_failed = False


def _build() -> bool:
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", _SRC, "-o", _SO, "-lz", "-lpthread"]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=240)
        return True
    except (subprocess.SubprocessError, FileNotFoundError):
        return False


def _load():
    global _lib, _failed
    with _lock:
        if _lib is not None or _failed:
            return _lib
        try:  # a shipped .so without the .cc source is fine (no rebuild check)
            stale = (not os.path.exists(_SO)
                     or os.path.getmtime(_SO) < os.path.getmtime(_SRC))
        except OSError:
            stale = not os.path.exists(_SO)
        if stale:
            if not _build():
                _failed = True
                return None
        try:
            lib = ctypes.CDLL(_SO)
        except OSError:
            _failed = True
            return None
        lib.fpnmt_decode_batch.restype = ctypes.c_int
        lib.fpnmt_decode_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int,
        ]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def decode_batch(paths: list[str], size: int, num_threads: int | None = None):
    """Returns (images (N, S, S, 3) float32 in [-1, 1], ok (N,) bool)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native image loader unavailable")
    n = len(paths)
    out = np.empty((n, size, size, 3), dtype=np.float32)
    ok = np.zeros(n, dtype=np.uint8)
    c_paths = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    threads = num_threads or min(16, os.cpu_count() or 1)
    lib.fpnmt_decode_batch(
        c_paths, n, size,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ok.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        threads,
    )
    return out, ok.astype(bool)
