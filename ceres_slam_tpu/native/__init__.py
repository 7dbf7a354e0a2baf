"""Native (C++) runtime components, loaded via ctypes.

The shared library is built lazily with the bundled Makefile on first use
and cached; everything degrades gracefully to pure-Python fallbacks if no
compiler is available.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

_DIR = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_DIR, "_csv_loader.so")
_lock = threading.Lock()
_lib = None
_build_failed = False


def _build() -> bool:
    try:
        subprocess.run(
            ["make", "-C", _DIR, "-s"],
            check=True,
            capture_output=True,
            timeout=120,
        )
        return os.path.exists(_LIB_PATH)
    except Exception:
        return False


def get_csv_loader():
    """Return the loaded ctypes library, or None if unavailable."""
    global _lib, _build_failed
    with _lock:
        if _lib is not None:
            return _lib
        if _build_failed:
            return None
        if not os.path.exists(_LIB_PATH) and not _build():
            _build_failed = True
            return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError:
            _build_failed = True
            return None
        lib.csv_load.restype = ctypes.c_void_p
        lib.csv_load.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_long),
            ctypes.POINTER(ctypes.c_long),
        ]
        lib.csv_values.restype = ctypes.POINTER(ctypes.c_double)
        lib.csv_values.argtypes = [ctypes.c_void_p]
        lib.csv_offsets.restype = ctypes.POINTER(ctypes.c_long)
        lib.csv_offsets.argtypes = [ctypes.c_void_p]
        lib.csv_free.argtypes = [ctypes.c_void_p]
        _lib = lib
        return _lib


def load_numeric_csv_native(path: str):
    """Parse a numeric CSV natively; returns (values, offsets) numpy arrays
    (row j = values[offsets[j]:offsets[j+1]]) or None if unavailable."""
    import numpy as np

    lib = get_csv_loader()
    if lib is None:
        return None
    n_rows = ctypes.c_long()
    n_vals = ctypes.c_long()
    h = lib.csv_load(path.encode(), ctypes.byref(n_rows), ctypes.byref(n_vals))
    if not h:
        return None
    try:
        vals = np.ctypeslib.as_array(
            lib.csv_values(h), shape=(n_vals.value,)
        ).copy()
        offs = np.ctypeslib.as_array(
            lib.csv_offsets(h), shape=(n_rows.value + 1,)
        ).copy()
    finally:
        lib.csv_free(h)
    return vals, offs
