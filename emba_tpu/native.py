"""ctypes loader for the native host ops (emba_tpu/cpp/host_ops.cpp).

Compiles ``libemba_host.so`` on first use (g++, see cpp/Makefile) and falls
back to the numpy implementations if no compiler is available. Public
functions mirror :mod:`emba_tpu.pairing`'s numpy versions and are used by it
when available.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_CPP_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "cpp")
_LIB_PATH = os.path.join(_CPP_DIR, "libemba_host.so")
_lib = None
_tried = False


def _load():
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    try:
        if not os.path.exists(_LIB_PATH) or os.path.getmtime(
            _LIB_PATH
        ) < os.path.getmtime(os.path.join(_CPP_DIR, "host_ops.cpp")):
            subprocess.run(
                ["make", "-s", "-C", _CPP_DIR],
                check=True,
                capture_output=True,
                timeout=120,
            )
        lib = ctypes.CDLL(_LIB_PATH)
        i32p = ctypes.POINTER(ctypes.c_int32)
        f64p = ctypes.POINTER(ctypes.c_double)
        lib.emba_prev_index.argtypes = [
            i32p, i32p, ctypes.c_int64, ctypes.c_int32, ctypes.c_int32, i32p,
        ]
        lib.emba_event_count.argtypes = [
            i32p, i32p, ctypes.c_int64, ctypes.c_int32, ctypes.c_int32, i32p,
        ]
        lib.emba_time_map.argtypes = [
            i32p, i32p, f64p, ctypes.c_int64, ctypes.c_int32, ctypes.c_int32,
            ctypes.c_double, f64p,
        ]
        _lib = lib
    except Exception:  # noqa: BLE001 — any failure means "use numpy"
        _lib = None
    return _lib


def available() -> bool:
    return _load() is not None


def _i32(a):
    return np.ascontiguousarray(a, dtype=np.int32)


def prev_index(x, y, width: int, height: int) -> np.ndarray | None:
    """O(N) native prev-event-index; None if the native lib is unavailable."""
    lib = _load()
    if lib is None:
        return None
    x = _i32(x)
    y = _i32(y)
    out = np.empty(len(x), dtype=np.int32)
    lib.emba_prev_index(
        x.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        y.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        len(x),
        width,
        height,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    return out


def event_count(x, y, width: int, height: int) -> np.ndarray | None:
    lib = _load()
    if lib is None:
        return None
    x = _i32(x)
    y = _i32(y)
    out = np.empty((height, width), dtype=np.int32)
    lib.emba_event_count(
        x.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        y.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        len(x),
        width,
        height,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    return out


def time_map(x, y, t, width: int, height: int, t0: float) -> np.ndarray | None:
    lib = _load()
    if lib is None:
        return None
    x = _i32(x)
    y = _i32(y)
    t = np.ascontiguousarray(t, dtype=np.float64)
    out = np.empty((height, width), dtype=np.float64)
    lib.emba_time_map(
        x.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        y.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        t.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        len(x),
        width,
        height,
        t0,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
    )
    return out
