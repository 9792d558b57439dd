"""ctypes bindings for the native (C++) data-path kernels.

Auto-builds native/libaudio_kernels.so on first use (make + g++); every entry
point has a numpy/scipy fallback so the pipeline works without a compiler.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_lib = None
_lock = threading.Lock()
_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")


def _load():
    global _lib
    if _lib is not None:
        return _lib
    with _lock:
        if _lib is not None:
            return _lib
        so_path = os.path.join(_NATIVE_DIR, "libaudio_kernels.so")
        if not os.path.exists(so_path):
            try:
                subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                               capture_output=True, timeout=120)
            except Exception:
                _lib = False
                return _lib
        try:
            lib = ctypes.CDLL(so_path)
        except OSError:
            _lib = False
            return _lib

        f32p = ctypes.POINTER(ctypes.c_float)
        lib.decode_pcm16.argtypes = [ctypes.POINTER(ctypes.c_int16),
                                     ctypes.c_int64, f32p]
        lib.decode_pcm24.argtypes = [ctypes.POINTER(ctypes.c_uint8),
                                     ctypes.c_int64, f32p]
        lib.decode_pcm32.argtypes = [ctypes.POINTER(ctypes.c_int32),
                                     ctypes.c_int64, f32p]
        lib.deinterleave.argtypes = [f32p, ctypes.c_int64, ctypes.c_int, f32p]
        lib.resample_poly_f32.argtypes = [
            f32p, ctypes.c_int64, ctypes.c_int, ctypes.c_int,
            f32p, ctypes.c_int, f32p, ctypes.c_int64,
        ]
        lib.lufs_integrated.restype = ctypes.c_double
        lib.lufs_integrated.argtypes = [f32p, ctypes.c_int, ctypes.c_int64,
                                        ctypes.c_int]
        _lib = lib
        return _lib


def available() -> bool:
    return bool(_load())


def decode_pcm16(data: bytes) -> np.ndarray:
    lib = _load()
    arr = np.frombuffer(data, dtype=np.int16)
    if not lib:
        return arr.astype(np.float32) / 32768.0
    out = np.empty(len(arr), np.float32)
    lib.decode_pcm16(
        arr.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)), len(arr),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    return out


def resample_poly_native(x: np.ndarray, up: int, down: int,
                         taps: np.ndarray) -> np.ndarray:
    """Polyphase resample with a caller-designed filter (matches
    scipy.signal.resample_poly with the same window)."""
    lib = _load()
    if not lib:
        from scipy import signal as sps

        return sps.resample_poly(x, up, down, window=taps).astype(np.float32)
    x = np.ascontiguousarray(x, np.float32)
    n_out = int(np.ceil(len(x) * up / down))
    out = np.empty(n_out, np.float32)
    taps = np.ascontiguousarray(taps, np.float32)
    lib.resample_poly_f32(
        x.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), len(x), up, down,
        taps.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), len(taps),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), n_out,
    )
    return out


def lufs_integrated(audio: np.ndarray, sample_rate: int) -> float:
    """audio: [C, T] float32 → integrated LUFS."""
    lib = _load()
    if not lib:
        from .utils import measure_loudness_lufs

        return measure_loudness_lufs(audio, sample_rate)
    audio = np.ascontiguousarray(audio, np.float32)
    if audio.ndim == 1:
        audio = audio[None]
    return float(lib.lufs_integrated(
        audio.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        audio.shape[0], audio.shape[1], sample_rate,
    ))
