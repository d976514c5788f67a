"""ctypes bindings for the native host-side IO library (native/msynth_io.cc).

WAV decode (any PCM/float format, downmix to mono) and polyphase
windowed-sinc resampling in C++ — keeps the host CPU out of the device
loop's critical path. Falls back gracefully: ``available()`` is False when
the shared library hasn't been built (scripts/build_native.sh), and callers
(utils.wav, data.dataset) use the scipy path instead.
"""

from __future__ import annotations

import ctypes
import math
from pathlib import Path

import numpy as np

__all__ = ["available", "decode_wav", "resample"]

_LIB_PATH = Path(__file__).parent / "_native" / "libmsynth_io.so"
_lib = None


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not _LIB_PATH.exists():
        return None
    lib = ctypes.CDLL(str(_LIB_PATH))
    lib.msynth_decode_wav.restype = ctypes.c_int
    lib.msynth_decode_wav.argtypes = [
        ctypes.c_char_p, ctypes.c_int64,
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int32),
    ]
    lib.msynth_resample.restype = ctypes.c_int
    lib.msynth_resample.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
        ctypes.c_int32, ctypes.c_int32,
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int64),
    ]
    _lib = lib
    return lib


def available() -> bool:
    """True when the C++ IO library is built and loadable (else scipy path)."""
    return _load() is not None


def decode_wav(data: bytes) -> tuple[int, np.ndarray]:
    """RIFF/WAVE bytes -> (sample_rate, float32 mono waveform)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native library not built (scripts/build_native.sh)")
    n = ctypes.c_int64(0)
    rate = ctypes.c_int32(0)
    rc = lib.msynth_decode_wav(data, len(data), None, 0,
                               ctypes.byref(n), ctypes.byref(rate))
    if rc != 0:
        raise ValueError(f"msynth_decode_wav failed: {rc}")
    out = np.empty(n.value, np.float32)
    rc = lib.msynth_decode_wav(
        data, len(data),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), n.value,
        ctypes.byref(n), ctypes.byref(rate),
    )
    if rc != 0:
        raise ValueError(f"msynth_decode_wav failed: {rc}")
    return rate.value, out


def resample(x: np.ndarray, sr_in: int, sr_out: int) -> np.ndarray:
    """Rational polyphase resampling, float32."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native library not built (scripts/build_native.sh)")
    x = np.ascontiguousarray(x, np.float32)
    if sr_in == sr_out:
        return x
    g = math.gcd(sr_in, sr_out)
    n_out = -(-len(x) * (sr_out // g) // (sr_in // g))
    out = np.empty(n_out, np.float32)
    got = ctypes.c_int64(0)
    rc = lib.msynth_resample(
        x.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), len(x),
        sr_in, sr_out,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), n_out,
        ctypes.byref(got),
    )
    if rc != 0:
        raise ValueError(f"msynth_resample failed: {rc}")
    return out[: got.value]
