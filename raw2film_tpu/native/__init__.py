"""Native host kernels (C++, ctypes-bound).

The reference's native I/O layer is vendored LibRaw (reference:
src/raw2film/raw_conversion.py:36-48 via rawpy). Here the equivalent lives
in-tree: ``r2f_native.cc`` provides lossless-JPEG (DNG Compression=7) decode
and fast strip unpack+normalize. The library builds lazily with g++ on first
use and everything degrades gracefully to pure-Python paths when a compiler
is unavailable (compressed DNGs then raise a clear error).
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_DIR, "libr2f_native.so")
_lib = None
_tried = False


def _build() -> bool:
    src = os.path.join(_DIR, "r2f_native.cc")
    try:
        subprocess.run(
            [
                os.environ.get("CXX", "g++"),
                "-O3",
                "-fPIC",
                "-shared",
                "-std=c++17",
                "-o",
                _LIB_PATH,
                src,
            ],
            check=True,
            capture_output=True,
            timeout=120,
        )
        return True
    except (subprocess.SubprocessError, FileNotFoundError, OSError):
        return False


def get_lib():
    """ctypes handle to the native library, building it on first use.
    Returns None when unavailable."""
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_LIB_PATH):
        if not _build():
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None
    lib.r2f_decode_ljpeg.restype = ctypes.c_int
    lib.r2f_decode_ljpeg.argtypes = [
        ctypes.c_char_p,
        ctypes.c_long,
        ctypes.POINTER(ctypes.c_uint16),
        ctypes.c_long,
        ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int),
    ]
    lib.r2f_unpack_normalize.restype = None
    lib.r2f_unpack_normalize.argtypes = [
        ctypes.c_char_p,
        ctypes.c_long,
        ctypes.c_int,
        ctypes.c_int,
        ctypes.c_float,
        ctypes.c_float,
        ctypes.POINTER(ctypes.c_float),
    ]
    lib.r2f_abi_version.restype = ctypes.c_int
    if lib.r2f_abi_version() != 1:
        return None
    _lib = lib
    return _lib


def have_native() -> bool:
    return get_lib() is not None


def decode_ljpeg(data: bytes, max_samples: int) -> tuple[np.ndarray, int, int, int]:
    """Decode a lossless JPEG (SOF3) byte stream -> (samples, w, h, comps)."""
    lib = get_lib()
    if lib is None:
        raise NotImplementedError(
            "lossless-JPEG DNGs need the native decoder; g++ was unavailable "
            "to build raw2film_tpu/native/libr2f_native.so"
        )
    out = np.empty(max_samples, np.uint16)
    w = ctypes.c_int()
    h = ctypes.c_int()
    comps = ctypes.c_int()
    rc = lib.r2f_decode_ljpeg(
        data,
        len(data),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)),
        max_samples,
        ctypes.byref(w),
        ctypes.byref(h),
        ctypes.byref(comps),
    )
    if rc != 0:
        raise ValueError(f"lossless JPEG decode failed (code {rc})")
    n = w.value * h.value * comps.value
    return out[:n], w.value, h.value, comps.value


def unpack_normalize(
    data: bytes, n: int, bits: int, big_endian: bool, black: float, inv_range: float
) -> np.ndarray:
    """Fast path for strip unpack + black/white normalize -> float32 [0,1]."""
    lib = get_lib()
    if lib is None:
        dtype = np.dtype((">" if big_endian else "<") + ("u2" if bits == 16 else "u1"))
        arr = np.frombuffer(data, dtype=dtype, count=n).astype(np.float32)
        return np.clip((arr - black) * inv_range, 0.0, 1.0)
    out = np.empty(n, np.float32)
    lib.r2f_unpack_normalize(
        data,
        n,
        bits,
        int(big_endian),
        float(black),
        float(inv_range),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    return out
