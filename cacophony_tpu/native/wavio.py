"""ctypes bindings for the native WAV decoder (wavio.cpp).

Builds on demand with g++ (once per machine; cached .so).  The Python-level
contract matches cacophony_tpu.data.audio_io.read_wav.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import List, Tuple

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, "libcacoph_wavio.so")
_lock = threading.Lock()
_lib = None


def _load():
    global _lib
    with _lock:
        if _lib is not None:
            return _lib
        stale = not os.path.exists(_SO) or any(
            os.path.getmtime(os.path.join(_DIR, f)) > os.path.getmtime(_SO)
            for f in os.listdir(_DIR) if f.endswith((".cpp", ".sh")))
        if stale:
            subprocess.run(["bash", os.path.join(_DIR, "build.sh")],
                           check=True, capture_output=True)
        lib = ctypes.CDLL(_SO)
        lib.cacoph_decode_wav.restype = ctypes.c_int
        lib.cacoph_decode_wav.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
            ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int32)]
        lib.cacoph_decode_batch.restype = None
        lib.cacoph_decode_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int32,
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int32]
        lib.cacoph_free.restype = None
        lib.cacoph_free.argtypes = [ctypes.POINTER(ctypes.c_float)]
        _lib = lib
        return lib


def read_wav(path: str) -> Tuple[np.ndarray, int]:
    """→ (float32 mono samples, sample_rate). Raises on decode failure."""
    lib = _load()
    data = ctypes.POINTER(ctypes.c_float)()
    n = ctypes.c_int64()
    sr = ctypes.c_int32()
    if not lib.cacoph_decode_wav(path.encode(), ctypes.byref(data),
                                 ctypes.byref(n), ctypes.byref(sr)):
        raise ValueError(f"native wav decode failed: {path}")
    try:
        out = np.ctypeslib.as_array(data, shape=(n.value,)).copy()
    finally:
        lib.cacoph_free(data)
    return out, int(sr.value)


def decode_batch(paths: List[str], buffer_samples: int,
                 num_threads: int = 0) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Thread-pooled batch decode into a fixed buffer.

    → (buffers (n, buffer_samples) f32, lengths (n,) i32, rates (n,) i32).
    Failed files have length 0.
    """
    lib = _load()
    n = len(paths)
    out = np.zeros((n, buffer_samples), np.float32)
    lengths = np.zeros(n, np.int32)
    rates = np.zeros(n, np.int32)
    ok = np.zeros(n, np.int32)
    arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    lib.cacoph_decode_batch(
        arr, n, out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        buffer_samples,
        lengths.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        rates.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        ok.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), num_threads)
    return out, lengths, rates
