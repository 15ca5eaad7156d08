"""Native (C++) host-side kernels, loaded via ctypes with lazy self-build.

The shared library is compiled on first use from ``femshell_native.cpp``
(g++ -O3) and cached next to the source; every entry point has a pure
Python/numpy fallback, so the framework works even without a toolchain.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "femshell_native.cpp")
_LIB = os.path.join(_DIR, "libfemshell_native.so")
_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> bool:
    cmd = ["g++", "-O3", "-std=c++17", "-shared", "-fPIC", _SRC, "-o", _LIB]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    """The loaded native library, building it on demand; None if unavailable."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        try:
            need_build = (not os.path.exists(_LIB)) or (
                os.path.getmtime(_SRC) > os.path.getmtime(_LIB)
            )
            if need_build and not _build():
                return None
            lib = ctypes.CDLL(_LIB)
            lib.ell_build.restype = ctypes.c_void_p
            lib.ell_build.argtypes = [
                ctypes.c_int32,
                ctypes.c_void_p,
                ctypes.c_int64,
                ctypes.c_void_p,
                ctypes.c_int64,
                ctypes.c_int32,
                ctypes.POINTER(ctypes.c_int32),
            ]
            lib.ell_fill.restype = None
            lib.ell_fill.argtypes = [ctypes.c_void_p] + [ctypes.c_void_p] * 4
            lib.ell_free.restype = None
            lib.ell_free.argtypes = [ctypes.c_void_p]
            _lib = lib
        except Exception:
            _lib = None
        return _lib


def build_ell_pattern_native(mesh, k_max: Optional[int] = None):
    """Native block-ELL pattern construction; None if the library is
    unavailable (caller falls back to the numpy implementation)."""
    lib = get_lib()
    if lib is None:
        return None
    from fem_shell_tpu.ops.assemble import EllPattern

    tri = np.ascontiguousarray(mesh.tri, dtype=np.int32)
    quad = np.ascontiguousarray(mesh.quad, dtype=np.int32)
    n = mesh.n_nodes
    k_out = ctypes.c_int32(0)
    handle = lib.ell_build(
        n,
        tri.ctypes.data_as(ctypes.c_void_p),
        tri.shape[0],
        quad.ctypes.data_as(ctypes.c_void_p),
        quad.shape[0],
        0 if k_max is None else int(k_max),
        ctypes.byref(k_out),
    )
    try:
        k = int(k_out.value)
        adj = np.empty((n, k), dtype=np.int32)
        valid = np.empty((n, k), dtype=np.uint8)
        tri_slot = np.empty((tri.shape[0], 3, 3), dtype=np.int32)
        quad_slot = np.empty((quad.shape[0], 4, 4), dtype=np.int32)
        lib.ell_fill(
            handle,
            adj.ctypes.data_as(ctypes.c_void_p),
            valid.ctypes.data_as(ctypes.c_void_p),
            tri_slot.ctypes.data_as(ctypes.c_void_p),
            quad_slot.ctypes.data_as(ctypes.c_void_p),
        )
    finally:
        lib.ell_free(handle)
    return EllPattern(adj, valid.astype(bool), tri_slot, quad_slot)
