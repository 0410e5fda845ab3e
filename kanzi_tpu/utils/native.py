"""ctypes loader for the native host runtime (native/bitrun.cpp).

Compiles the shared object on first use (g++ is part of the toolchain;
no packages are installed) and caches it next to the source. Falls back
cleanly: callers must check `available()`.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_lock = threading.Lock()
_lib = None
_tried = False

_SRC = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native", "bitrun.cpp")
_SO = os.path.join(os.path.dirname(_SRC), "libkanzibitrun.so")


def _load():
    global _lib, _tried
    with _lock:
        if _tried:
            return _lib
        _tried = True
        try:
            if (not os.path.exists(_SO)
                    or os.path.getmtime(_SO) < os.path.getmtime(_SRC)):
                subprocess.run(
                    ["g++", "-O3", "-shared", "-fPIC", _SRC, "-o", _SO],
                    check=True, capture_output=True, timeout=120)
            lib = ctypes.CDLL(_SO)
            u8p = ctypes.POINTER(ctypes.c_uint8)
            u64p = ctypes.POINTER(ctypes.c_uint64)
            lib.kz_concat_runs.restype = ctypes.c_uint64
            lib.kz_concat_runs.argtypes = [
                u8p, ctypes.c_uint64, u8p, u8p, u8p, u64p, u64p,
                ctypes.c_int64]
            _lib = lib
        except Exception:
            _lib = None
        return _lib


def available() -> bool:
    return _load() is not None


def concat_runs(buf0: np.ndarray, buf1: np.ndarray, sel: np.ndarray,
                offs: np.ndarray, bitlens: np.ndarray):
    """Concatenate bit runs (see native/bitrun.cpp). Returns
    (bytes, total_bits). Runs are byte-aligned in their source buffers;
    the output is a packed MSB-first bit string."""
    lib = _load()
    total_bits = int(bitlens.sum())
    out = np.zeros((total_bits + 7) // 8 + 8, dtype=np.uint8)
    u8p = ctypes.POINTER(ctypes.c_uint8)
    u64p = ctypes.POINTER(ctypes.c_uint64)
    sel = np.ascontiguousarray(sel, dtype=np.uint8)
    offs = np.ascontiguousarray(offs, dtype=np.uint64)
    bl = np.ascontiguousarray(bitlens, dtype=np.uint64)
    buf0 = np.ascontiguousarray(buf0, dtype=np.uint8)
    buf1 = np.ascontiguousarray(buf1, dtype=np.uint8)
    end = lib.kz_concat_runs(
        out.ctypes.data_as(u8p), 0,
        buf0.ctypes.data_as(u8p), buf1.ctypes.data_as(u8p),
        sel.ctypes.data_as(u8p), offs.ctypes.data_as(u64p),
        bl.ctypes.data_as(u64p), len(sel))
    assert end == total_bits
    return out[: (total_bits + 7) // 8].tobytes(), total_bits
