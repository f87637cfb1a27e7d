"""Native (C++) helpers, loaded via ctypes.

The environment has no pybind11; the shared library is built on first use
with g++ (cached next to the source) and exposed through a C ABI. Every
native entry point has a pure-numpy fallback, so the package works without
a compiler.
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
import threading

import numpy as np

log = logging.getLogger("lightpycl_tpu.native")

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "oracle.cpp")
_LIB = os.path.join(_HERE, "_oracle.so")
_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> bool:
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-o", _LIB, _SRC]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except (OSError, subprocess.SubprocessError) as e:
        log.info("native oracle build failed (numpy fallback): %s", e)
        return False


def get_lib():
    """Load (building if needed) the native library, or None."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_LIB) or (
            os.path.getmtime(_LIB) < os.path.getmtime(_SRC)
        ):
            if not _build():
                return None
        try:
            lib = ctypes.CDLL(_LIB)
        except OSError as e:
            log.info("native oracle load failed: %s", e)
            return None
        dp = ctypes.POINTER(ctypes.c_double)
        ip = ctypes.POINTER(ctypes.c_int64)
        lib.mt_nearest_hit.argtypes = [
            dp, dp, ctypes.c_int64, dp, dp, dp, ctypes.c_int64,
            ctypes.c_double, ctypes.c_double, ctypes.c_double, dp, ip,
        ]
        lib.mt_nearest_hit.restype = None
        _lib = lib
        return _lib


def mt_nearest_hit_native(o, d, v0, e1, e2, eps, eps_b, t_max):
    """C++ f64 nearest hit; returns (t, idx) or None if unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    o = np.ascontiguousarray(o, np.float64)
    d = np.ascontiguousarray(d, np.float64)
    v0 = np.ascontiguousarray(v0, np.float64)
    e1 = np.ascontiguousarray(e1, np.float64)
    e2 = np.ascontiguousarray(e2, np.float64)
    n, m = len(o), len(v0)
    t = np.empty(n, np.float64)
    idx = np.empty(n, np.int64)
    dp = ctypes.POINTER(ctypes.c_double)
    ip = ctypes.POINTER(ctypes.c_int64)
    lib.mt_nearest_hit(
        o.ctypes.data_as(dp), d.ctypes.data_as(dp), n,
        v0.ctypes.data_as(dp), e1.ctypes.data_as(dp), e2.ctypes.data_as(dp), m,
        float(eps), float(eps_b), float(t_max),
        t.ctypes.data_as(dp), idx.ctypes.data_as(ip),
    )
    return t, idx
