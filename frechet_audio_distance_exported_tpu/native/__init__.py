"""ctypes loader for the native host runtime (fad_native.cpp).

Builds the shared library on first use with g++ (cached next to the source;
FAD_TPU_NATIVE_DIR overrides the cache location), exposes typed wrappers, and
degrades gracefully: every entry point has a NumPy fallback at its call site,
so `available()` returning False only costs speed.
Set FAD_TPU_DISABLE_NATIVE=1 to force the NumPy paths.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_SRC = os.path.join(os.path.dirname(os.path.abspath(__file__)), "fad_native.cpp")
_LOCK = threading.Lock()
_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _build_and_load() -> Optional[ctypes.CDLL]:
    cache_dir = os.environ.get("FAD_TPU_NATIVE_DIR") or os.path.dirname(_SRC)
    so_path = os.path.join(cache_dir, "fad_native.so")
    try:
        if not os.path.exists(so_path) or os.path.getmtime(so_path) < os.path.getmtime(_SRC):
            cmd = [
                "g++", "-O3", "-fopenmp", "-shared", "-fPIC",
                _SRC, "-o", so_path,
            ]
            subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        lib = ctypes.CDLL(so_path)
    except Exception:
        return None

    lib.resample_kaiser.argtypes = [
        ctypes.POINTER(ctypes.c_double), ctypes.c_int64, ctypes.c_int64,
        ctypes.c_double,
        ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
        ctypes.c_int64, ctypes.c_int64,
        ctypes.POINTER(ctypes.c_double),
    ]
    lib.resample_kaiser.restype = None
    lib.pcm16_to_f32.argtypes = [
        ctypes.POINTER(ctypes.c_int16), ctypes.c_int64, ctypes.c_int32,
        ctypes.c_int32, ctypes.POINTER(ctypes.c_float),
    ]
    lib.pcm16_to_f32.restype = None
    lib.pcm32_to_f32.argtypes = [
        ctypes.POINTER(ctypes.c_int32), ctypes.c_int64, ctypes.c_int32,
        ctypes.c_int32, ctypes.POINTER(ctypes.c_float),
    ]
    lib.pcm32_to_f32.restype = None
    lib.flac_rice_residuals.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64, ctypes.c_int64,
        ctypes.c_int32, ctypes.c_int32, ctypes.POINTER(ctypes.c_int64),
    ]
    lib.flac_rice_residuals.restype = ctypes.c_int64
    lib.flac_reconstruct_fixed.argtypes = [
        ctypes.POINTER(ctypes.c_int64), ctypes.c_int64, ctypes.c_int32,
    ]
    lib.flac_reconstruct_fixed.restype = None
    lib.flac_reconstruct_lpc.argtypes = [
        ctypes.POINTER(ctypes.c_int64), ctypes.c_int64, ctypes.c_int32,
        ctypes.POINTER(ctypes.c_int32), ctypes.c_int32,
    ]
    lib.flac_reconstruct_lpc.restype = None
    lib.fad_native_abi_version.restype = ctypes.c_int32
    if lib.fad_native_abi_version() != 1:
        return None
    return lib


def _lib() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if os.environ.get("FAD_TPU_DISABLE_NATIVE"):
        return None
    if _TRIED:
        return _LIB
    with _LOCK:
        if not _TRIED:
            _LIB = _build_and_load()
            globals()["_TRIED"] = True
    return _LIB


def available() -> bool:
    return _lib() is not None


def resample_kaiser(
    x: np.ndarray, sample_ratio: float, n_out: int,
    win: np.ndarray, delta: np.ndarray, num_table: int,
) -> Optional[np.ndarray]:
    """Native wing-accumulation loop; returns None if the library is absent."""
    lib = _lib()
    if lib is None:
        return None
    x64 = np.ascontiguousarray(x, dtype=np.float64)
    y = np.empty(n_out, dtype=np.float64)
    lib.resample_kaiser(
        x64.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        x64.shape[0], n_out, float(sample_ratio),
        np.ascontiguousarray(win).ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        np.ascontiguousarray(delta).ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        win.shape[0], num_table,
        y.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
    )
    return y


def flac_rice_residuals(data: bytes, bit_pos: int, block_size: int, order: int):
    """Partitioned-Rice residual decode (FLAC). Returns (residuals, new_bit_pos)
    or None if the library is absent / the stream needs the Python fallback
    (which produces the detailed error)."""
    lib = _lib()
    if lib is None:
        return None
    out = np.empty(block_size - order, dtype=np.int64)
    buf = np.frombuffer(data, dtype=np.uint8)
    new_pos = lib.flac_rice_residuals(
        buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        buf.shape[0], bit_pos, block_size, order,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
    )
    if new_pos < 0:
        return None
    return out, int(new_pos)


def flac_reconstruct(x: np.ndarray, order: int, coefs=None, shift: int = 0) -> bool:
    """In-place predictor reconstruction (FIXED when coefs is None, else LPC).
    Returns False when the library is absent."""
    lib = _lib()
    if lib is None:
        return False
    assert x.dtype == np.int64 and x.flags.c_contiguous
    ptr = x.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))
    if coefs is None:
        lib.flac_reconstruct_fixed(ptr, x.shape[0], order)
    else:
        c = np.ascontiguousarray(coefs, dtype=np.int32)
        lib.flac_reconstruct_lpc(
            ptr, x.shape[0], order,
            c.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), shift,
        )
    return True


def pcm_to_f32(samples: np.ndarray, channels: int, mixdown: bool) -> Optional[np.ndarray]:
    """Native int16/int32 PCM -> float32 (+ optional mean mixdown)."""
    lib = _lib()
    if lib is None:
        return None
    frames = samples.shape[0] // channels if samples.ndim == 1 else samples.shape[0]
    flat = np.ascontiguousarray(samples).reshape(-1)
    out_n = frames if (mixdown and channels > 1) else frames * channels
    out = np.empty(out_n, dtype=np.float32)
    if flat.dtype == np.int16:
        lib.pcm16_to_f32(
            flat.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)), frames, channels,
            int(mixdown), out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        )
    elif flat.dtype == np.int32:
        lib.pcm32_to_f32(
            flat.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), frames, channels,
            int(mixdown), out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        )
    else:
        return None
    if not (mixdown and channels > 1) and channels > 1:
        return out.reshape(frames, channels)
    return out
