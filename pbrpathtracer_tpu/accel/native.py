"""ctypes bridge to the native C++ SAH BVH builder (accel/cpp/).

Compiles the shared library on first use with g++ (-O3) into
``accel/cpp/_build`` and caches it. Falls back to the numpy builder
silently if no toolchain is available (the layouts are identical)."""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np
import jax.numpy as jnp

from .build import FlatBVH, build_bvh as build_bvh_numpy

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "cpp", "bvh_builder.cpp")
_BUILD_DIR = os.path.join(_HERE, "cpp", "_build")
_LIB_PATH = os.path.join(_BUILD_DIR, "libptxbvh.so")

_lock = threading.Lock()
_lib = None
_lib_failed = False


def _compile() -> str | None:
    os.makedirs(_BUILD_DIR, exist_ok=True)
    try:
        src_mtime = os.path.getmtime(_SRC)
        if (os.path.exists(_LIB_PATH)
                and os.path.getmtime(_LIB_PATH) >= src_mtime):
            return _LIB_PATH
        subprocess.run(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC",
             "-std=c++17", _SRC, "-o", _LIB_PATH],
            check=True, capture_output=True, timeout=120)
        return _LIB_PATH
    except (OSError, subprocess.SubprocessError):
        return None


def _get_lib():
    global _lib, _lib_failed
    with _lock:
        if _lib is not None or _lib_failed:
            return _lib
        path = _compile()
        if path is None:
            _lib_failed = True
            return None
        lib = ctypes.CDLL(path)
        f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
        i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
        lib.ptx_build_bvh.argtypes = [
            f32p, f32p, f32p, ctypes.c_int, ctypes.c_int,
            f32p, f32p, i32p, i32p, i32p, i32p, ctypes.c_int]
        lib.ptx_build_bvh.restype = ctypes.c_int
        _lib = lib
        return _lib


def native_available() -> bool:
    return _get_lib() is not None


def build_bvh_native(v0, v1, v2, leaf_size: int = 8) -> FlatBVH:
    """SAH BVH via the C++ builder; numpy-builder fallback."""
    lib = _get_lib()
    v0 = np.ascontiguousarray(v0, np.float32)
    v1 = np.ascontiguousarray(v1, np.float32)
    v2 = np.ascontiguousarray(v2, np.float32)
    T = v0.shape[0]
    if lib is None or T == 0:
        return build_bvh_numpy(v0, v1, v2, leaf_size=leaf_size)

    max_nodes = 2 * T + 8
    bmin = np.empty((max_nodes, 3), np.float32)
    bmax = np.empty((max_nodes, 3), np.float32)
    first = np.empty(max_nodes, np.int32)
    count = np.empty(max_nodes, np.int32)
    escape = np.empty(max_nodes, np.int32)
    perm = np.empty(T, np.int32)
    n = lib.ptx_build_bvh(v0, v1, v2, T, leaf_size, bmin, bmax, first,
                          count, escape, perm, max_nodes)
    if n <= 0:
        return build_bvh_numpy(v0, v1, v2, leaf_size=leaf_size)
    return FlatBVH(
        bounds_min=jnp.asarray(bmin[:n]), bounds_max=jnp.asarray(bmax[:n]),
        first=jnp.asarray(first[:n]), count=jnp.asarray(count[:n]),
        escape=jnp.asarray(escape[:n]), perm=jnp.asarray(perm),
        leaf_size=leaf_size)


def build_bvh_auto(v0, v1, v2, leaf_size: int = 8,
                   native_threshold: int = 20000) -> FlatBVH:
    """Route: numpy builder for small scenes (no compile dependency), the
    C++ SAH builder when it pays off."""
    if np.asarray(v0).shape[0] >= native_threshold and native_available():
        return build_bvh_native(v0, v1, v2, leaf_size=leaf_size)
    return build_bvh_numpy(v0, v1, v2, leaf_size=leaf_size)
