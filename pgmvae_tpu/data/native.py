"""ctypes binding for the native fastcsv parser (native/fastcsv.cpp).

The shared library is built on demand with the repo Makefile (g++ is part of
the image toolchain) and cached next to the source; loading failures of any
kind degrade silently to the numpy parser in loader.py — native IO is a perf
path, never a hard dependency.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), 'native')
_LIB_PATH = os.path.join(_NATIVE_DIR, 'libfastcsv.so')

_lock = threading.Lock()
_lib = None
_lib_failed = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _lib_failed
    with _lock:
        if _lib is not None or _lib_failed:
            return _lib
        try:
            if not os.path.exists(_LIB_PATH):
                subprocess.run(['make', '-C', _NATIVE_DIR, '-s'],
                               check=True, capture_output=True, timeout=120)
            lib = ctypes.CDLL(_LIB_PATH)
            lib.fastcsv_parse.restype = ctypes.c_int
            lib.fastcsv_parse.argtypes = [
                ctypes.c_char_p, ctypes.c_int64,
                ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64,
                ctypes.POINTER(ctypes.c_int64)]
            _lib = lib
        except Exception:  # noqa: BLE001 — perf path only, fall back
            _lib_failed = True
        return _lib


def available() -> bool:
    return _load() is not None


def parse_binary_csv(path: str, n_var: int) -> Optional[np.ndarray]:
    """Parse a 0/1 CSV into uint8 [N, n_var], or None if the native path is
    unavailable or the file doesn't have the fast single-char layout."""
    lib = _load()
    if lib is None:
        return None
    try:
        size = os.path.getsize(path)
    except OSError:
        return None
    max_rows = size // (2 * n_var) + 1
    out = np.empty((max_rows, n_var), np.uint8)
    rows = ctypes.c_int64(0)
    rc = lib.fastcsv_parse(
        path.encode(), n_var,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        max_rows, ctypes.byref(rows))
    if rc != 0:
        return None
    return out[:rows.value]
