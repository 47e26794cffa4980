"""Native host runtime: ctypes bindings for the C++ frame pump.

The library is compiled on demand with g++ (cached next to the source).
If no toolchain is available the caller should fall back to the pure
Python ``ptam_cg_tpu.io.tum`` loader.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Tuple

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "framepump.cpp")
_SO = os.path.join(_HERE, "libframepump.so")
_lock = threading.Lock()
_lib = None


def _build() -> None:
    cmd = ["g++", "-O3", "-std=c++17", "-shared", "-fPIC", "-o", _SO,
           _SRC, "-lpthread"]
    subprocess.run(cmd, check=True, capture_output=True)


def load_library() -> Optional[ctypes.CDLL]:
    """Build (if needed) and load the native library; None on failure."""
    global _lib
    with _lock:
        if _lib is not None:
            return _lib
        try:
            if (not os.path.exists(_SO)
                    or os.path.getmtime(_SO) < os.path.getmtime(_SRC)):
                _build()
            lib = ctypes.CDLL(_SO)
        except (OSError, subprocess.CalledProcessError):
            return None
        lib.fp_open.restype = ctypes.c_void_p
        lib.fp_open.argtypes = [ctypes.c_char_p, ctypes.c_int,
                                ctypes.c_int]
        lib.fp_count.restype = ctypes.c_int
        lib.fp_count.argtypes = [ctypes.c_void_p]
        lib.fp_next.restype = ctypes.c_int
        lib.fp_next.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_float),
            ctypes.c_int, ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_double)]
        lib.fp_close.argtypes = [ctypes.c_void_p]
        _lib = lib
        return _lib


class NativeFramePump:
    """Asynchronous prefetching dataset reader (native worker thread).

    Drop-in alternative to ``io.tum.TumDataset`` for .npy/.pgm datasets:
    decoding runs in C++ while Python/JAX works on the previous frame.
    """

    def __init__(self, root: str, prefetch: int = 4, loop: bool = True,
                 max_pixels: int = 1920 * 1080):
        lib = load_library()
        if lib is None:
            raise RuntimeError("native framepump unavailable "
                               "(g++ build failed)")
        self._lib = lib
        self._handle = lib.fp_open(root.encode(), prefetch,
                                   1 if loop else 0)
        if not self._handle:
            raise FileNotFoundError(f"no rgb.txt index under {root}")
        self._buf = np.empty(max_pixels, np.float32)

    def __len__(self) -> int:
        return self._lib.fp_count(self._handle)

    def next_frame(self) -> Tuple[float, np.ndarray]:
        h = ctypes.c_int()
        w = ctypes.c_int()
        ts = ctypes.c_double()
        rc = self._lib.fp_next(
            self._handle,
            self._buf.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            self._buf.size, ctypes.byref(h), ctypes.byref(w),
            ctypes.byref(ts))
        if rc == -1:
            raise StopIteration
        if rc != 0:
            raise IOError(f"framepump decode error rc={rc}")
        frame = self._buf[: h.value * w.value].reshape(
            h.value, w.value).copy()
        return ts.value, frame

    def close(self):
        if self._handle:
            self._lib.fp_close(self._handle)
            self._handle = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
