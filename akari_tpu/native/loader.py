"""Build + load the native library (ctypes; no pybind11 in this image)."""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "bvh_builder.cpp")
_LIB = os.path.join(_DIR, "libakr_bvh.so")

_lock = threading.Lock()
_lib = None
_tried = False


def _compile():
    cmd = [
        "g++", "-O3", "-shared", "-fPIC", "-std=c++17",
        "-o", _LIB, _SRC, "-lpthread",
    ]
    subprocess.run(cmd, check=True, capture_output=True)


def get_bvh_lib():
    """Returns the loaded ctypes library, or None if unavailable."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        try:
            if not os.path.exists(_LIB) or (
                os.path.getmtime(_LIB) < os.path.getmtime(_SRC)
            ):
                _compile()
            lib = ctypes.CDLL(_LIB)
            lib.akr_bvh_build.restype = ctypes.c_int
            lib.akr_bvh_build.argtypes = [
                ctypes.POINTER(ctypes.c_float),  # p0
                ctypes.POINTER(ctypes.c_float),  # p1
                ctypes.POINTER(ctypes.c_float),  # p2
                ctypes.c_int64,                  # n_tris
                ctypes.c_int,                    # max_leaf
                ctypes.POINTER(ctypes.c_float),  # node_lo
                ctypes.POINTER(ctypes.c_float),  # node_hi
                ctypes.POINTER(ctypes.c_int32),  # first
                ctypes.POINTER(ctypes.c_int32),  # count
                ctypes.POINTER(ctypes.c_int32),  # miss
                ctypes.POINTER(ctypes.c_int32),  # order
                ctypes.c_int64,                  # max_nodes
                ctypes.POINTER(ctypes.c_int64),  # out_n_nodes
            ]
            _lib = lib
        except Exception:
            _lib = None
        return _lib


def native_available():
    return get_bvh_lib() is not None
