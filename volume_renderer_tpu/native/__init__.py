"""ctypes bindings for the native host runtime (native/vrtcore.cpp).

The TPU compute path is JAX/XLA; this module is the CPU data-path: LUT
generation, volume preprocessing (gradients, resize, normalize, pad, MIP),
timestamps, and content hashing for identical-volume dedup — the same
responsibilities the reference implements in C++ (HenyeyGreenstein.cc,
timestamp.cpp, and the host side of Volume.m's ops).

Every function has a numpy fallback so the package works without the
compiled library; ``available()`` reports which path is active. Build with
``make -C native`` (repo root).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_LIB_NAME = "libvrtcore.so"
_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))), "native"
)

_lib: Optional[ctypes.CDLL] = None
_load_attempted = False

_f32p = ctypes.POINTER(ctypes.c_float)


def _try_build() -> bool:
    """Build the library in-tree if a toolchain is available."""
    try:
        subprocess.run(
            ["make", "-C", _NATIVE_DIR, "-s"],
            check=True,
            capture_output=True,
            timeout=120,
        )
        return True
    except Exception:
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _load_attempted
    if _lib is not None or _load_attempted:
        return _lib
    _load_attempted = True
    path = os.path.join(_NATIVE_DIR, _LIB_NAME)
    if not os.path.exists(path):
        if not _try_build():
            return None
    try:
        lib = ctypes.CDLL(path)
    except OSError:
        return None

    lib.vrt_timestamp_ms.restype = ctypes.c_uint64
    lib.vrt_hash.restype = ctypes.c_uint64
    lib.vrt_hash.argtypes = [_f32p, ctypes.c_int64]
    lib.vrt_hg_lut.restype = ctypes.c_int
    lib.vrt_hg_lut.argtypes = [_f32p, ctypes.c_int, ctypes.c_float]
    lib.vrt_gradient.restype = ctypes.c_int
    lib.vrt_gradient.argtypes = [_f32p, _f32p, _f32p, _f32p,
                                 ctypes.c_int64, ctypes.c_int64, ctypes.c_int64]
    lib.vrt_resize_trilinear.restype = ctypes.c_int
    lib.vrt_resize_trilinear.argtypes = [
        _f32p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
        _f32p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
    ]
    lib.vrt_normalize.restype = ctypes.c_int
    lib.vrt_normalize.argtypes = [_f32p, ctypes.c_int64, ctypes.c_float, ctypes.c_float]
    lib.vrt_pad.restype = ctypes.c_int
    lib.vrt_pad.argtypes = [_f32p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
                            _f32p, ctypes.c_int64, ctypes.c_float]
    lib.vrt_mip.restype = ctypes.c_int
    lib.vrt_mip.argtypes = [_f32p, _f32p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64]
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def _ptr(a: np.ndarray):
    return a.ctypes.data_as(_f32p)


def _c_contig(a) -> np.ndarray:
    return np.ascontiguousarray(np.asarray(a, dtype=np.float32))


def timestamp_ms() -> int:
    """Epoch milliseconds (reference timestamp.cpp)."""
    lib = _load()
    if lib is not None:
        return int(lib.vrt_timestamp_ms())
    import time

    return int(time.time() * 1000)


def content_hash(vol) -> int:
    """64-bit content hash for identical-volume dedup."""
    v = _c_contig(vol)
    lib = _load()
    if lib is not None:
        return int(lib.vrt_hash(_ptr(v), v.size))
    import hashlib

    return int.from_bytes(hashlib.blake2b(v.tobytes(), digest_size=8).digest(), "little")


def hg_lut(n: int, g: float = 0.8) -> np.ndarray:
    """Henyey-Greenstein LUT, (n, n, n) float32 (reference HenyeyGreenstein.cc)."""
    if not -1.0 <= g <= 1.0:
        raise ValueError("g must be in interval [-1,1]")
    lib = _load()
    if lib is not None:
        out = np.empty((n, n, n), np.float32)
        lib.vrt_hg_lut(_ptr(out), n, ctypes.c_float(g))
        return out
    # numpy fallback (mirrors ops/hg.py math)
    idx = np.arange(n, dtype=np.float32) * np.float32(np.pi / n)
    gamma, alpha, beta = idx[:, None, None], idx[None, :, None], idx[None, None, :]
    cos_t = np.sin(alpha) * np.sin(beta) + np.cos(gamma) * np.cos(alpha) * np.cos(beta)
    return (1 / (4 * np.pi) * (1 - g * g) / np.sqrt((1 + g * g - 2 * g * cos_t) ** 3)).astype(
        np.float32
    )


def gradient(vol) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(d/dx, d/dy, d/dz) central differences, numpy.gradient semantics."""
    v = _c_contig(vol)
    lib = _load()
    if lib is not None:
        gx = np.empty_like(v)
        gy = np.empty_like(v)
        gz = np.empty_like(v)
        d, h, w = v.shape
        lib.vrt_gradient(_ptr(v), _ptr(gx), _ptr(gy), _ptr(gz), d, h, w)
        return gx, gy, gz
    gz, gy, gx = np.gradient(v)
    return gx.astype(np.float32), gy.astype(np.float32), gz.astype(np.float32)


def resize_trilinear(vol, new_shape_dhw: Tuple[int, int, int]) -> np.ndarray:
    """Trilinear resize with half-pixel centers.

    Matches jax.image.resize(method="linear", antialias=False) exactly;
    plain resampling, no antialias prefilter on downscale.
    """
    v = _c_contig(vol)
    dd, dh, dw = (int(s) for s in new_shape_dhw)
    lib = _load()
    if lib is not None:
        out = np.empty((dd, dh, dw), np.float32)
        sd, sh, sw = v.shape
        lib.vrt_resize_trilinear(_ptr(v), sd, sh, sw, _ptr(out), dd, dh, dw)
        return out
    import jax

    return np.asarray(jax.image.resize(v, (dd, dh, dw), method="linear", antialias=False))


def normalize(vol, new_min: float = 0.0, new_max: float = 1.0) -> np.ndarray:
    v = _c_contig(vol).copy()
    lib = _load()
    if lib is not None:
        lib.vrt_normalize(_ptr(v), v.size, ctypes.c_float(new_min), ctypes.c_float(new_max))
        return v
    mn, mx = v.min(), v.max()
    return ((v - mn) * (new_max - new_min) / (mx - mn) + new_min).astype(np.float32)


def pad(vol, padding: int, value: float = 0.0) -> np.ndarray:
    v = _c_contig(vol)
    p = int(padding)
    lib = _load()
    if lib is not None:
        d, h, w = v.shape
        out = np.empty((d + 2 * p, h + 2 * p, w + 2 * p), np.float32)
        lib.vrt_pad(_ptr(v), d, h, w, _ptr(out), p, ctypes.c_float(value))
        return out
    return np.pad(v, p, constant_values=value).astype(np.float32)


def mip(vol) -> np.ndarray:
    v = _c_contig(vol)
    lib = _load()
    if lib is not None:
        d, h, w = v.shape
        out = np.empty((h, w), np.float32)
        lib.vrt_mip(_ptr(v), _ptr(out), d, h, w)
        return out
    return v.max(axis=0)
