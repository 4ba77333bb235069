"""ctypes bindings for the native host runtime (native/fovnative.cpp).

The reference's host layer is C++ (OptiX Trbvh build PathTracer.cpp:641,
sutil OBJ loader Mesh.h:64-85); ours is too: a binned-SAH BVH builder and
an OBJ parser in a small shared library, loaded via ctypes (no pybind11
in the image). The library is compiled lazily with g++ on first use and
cached next to the source; every caller falls back to the pure-Python
implementation when the toolchain or library is unavailable, so the
framework never hard-depends on the native path.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(__file__)),
                           "native")
_SO_PATH = os.path.join(_NATIVE_DIR, "libfovnative.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    src = os.path.join(_NATIVE_DIR, "fovnative.cpp")
    if not os.path.exists(src):
        return False
    try:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-fPIC", "-shared",
             "-std=c++17", "-o", _SO_PATH, src],
            check=True, capture_output=True, timeout=120,
        )
        return True
    except Exception:
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    """The native library, building it on first use; None if unavailable."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_SO_PATH) and not _build():
            return None
        try:
            lib = ctypes.CDLL(_SO_PATH)
        except OSError:
            return None

        c = ctypes
        fp = c.POINTER(c.c_float)
        u8p = c.POINTER(c.c_uint8)
        i32p = c.POINTER(c.c_int32)
        i64p = c.POINTER(c.c_int64)

        lib.fov_bvh_build.restype = c.c_void_p
        lib.fov_bvh_build.argtypes = [fp, fp, fp, u8p, c.c_int64,
                                      c.c_int, c.c_int, c.c_int]
        lib.fov_bvh_num_nodes.restype = c.c_int64
        lib.fov_bvh_num_nodes.argtypes = [c.c_void_p]
        lib.fov_bvh_order_len.restype = c.c_int64
        lib.fov_bvh_order_len.argtypes = [c.c_void_p]
        lib.fov_bvh_max_depth.restype = c.c_int32
        lib.fov_bvh_max_depth.argtypes = [c.c_void_p]
        lib.fov_bvh_copy.restype = None
        lib.fov_bvh_copy.argtypes = [c.c_void_p, fp, fp, i32p, i32p, i32p,
                                     i64p]
        lib.fov_bvh_free.restype = None
        lib.fov_bvh_free.argtypes = [c.c_void_p]

        lib.fov_obj_load.restype = c.c_void_p
        lib.fov_obj_load.argtypes = [c.c_char_p]
        lib.fov_obj_num_vertices.restype = c.c_int64
        lib.fov_obj_num_vertices.argtypes = [c.c_void_p]
        lib.fov_obj_num_tris.restype = c.c_int64
        lib.fov_obj_num_tris.argtypes = [c.c_void_p]
        lib.fov_obj_has_normals.restype = c.c_int32
        lib.fov_obj_has_normals.argtypes = [c.c_void_p]
        lib.fov_obj_has_uvs.restype = c.c_int32
        lib.fov_obj_has_uvs.argtypes = [c.c_void_p]
        lib.fov_obj_copy.restype = None
        lib.fov_obj_copy.argtypes = [c.c_void_p, fp, fp, fp, i64p]
        lib.fov_obj_free.restype = None
        lib.fov_obj_free.argtypes = [c.c_void_p]

        _lib = lib
        return _lib


def available() -> bool:
    return get_lib() is not None


def _fp(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def build_bvh_native(v0: np.ndarray, e1: np.ndarray, e2: np.ndarray,
                     valid: np.ndarray, max_leaf: int = 16,
                     leaf_align: int = 16, num_bins: int = 16):
    """Native BVH build; returns the same dict of flat arrays as the
    Python builder (fovtrace/scene/bvh.py), or None if unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    v0 = np.ascontiguousarray(v0, np.float32)
    e1 = np.ascontiguousarray(e1, np.float32)
    e2 = np.ascontiguousarray(e2, np.float32)
    valid = np.ascontiguousarray(valid, np.uint8)
    h = lib.fov_bvh_build(
        _fp(v0), _fp(e1), _fp(e2),
        valid.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        v0.shape[0], max_leaf, leaf_align, num_bins,
    )
    if not h:
        return None
    try:
        nn = lib.fov_bvh_num_nodes(h)
        ol = lib.fov_bvh_order_len(h)
        nodes_min = np.empty((nn, 3), np.float32)
        nodes_max = np.empty((nn, 3), np.float32)
        nodes_left = np.empty((nn,), np.int32)
        nodes_right = np.empty((nn,), np.int32)
        nodes_leaf = np.empty((nn,), np.int32)
        order = np.empty((ol,), np.int64)
        lib.fov_bvh_copy(
            h, _fp(nodes_min), _fp(nodes_max),
            nodes_left.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            nodes_right.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            nodes_leaf.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            order.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        )
        max_depth = lib.fov_bvh_max_depth(h)
    finally:
        lib.fov_bvh_free(h)
    return dict(nodes_min=nodes_min, nodes_max=nodes_max,
                nodes_left=nodes_left, nodes_right=nodes_right,
                nodes_leaf=nodes_leaf, order=order, max_depth=int(max_depth))


def load_obj_native(path: str):
    """Native OBJ parse -> (positions [V,3], tris [T,3], normals|None,
    uvs|None), or None if unavailable / unparsable."""
    lib = get_lib()
    if lib is None:
        return None
    h = lib.fov_obj_load(path.encode())
    if not h:
        return None
    try:
        nv = lib.fov_obj_num_vertices(h)
        nt = lib.fov_obj_num_tris(h)
        pos = np.empty((nv, 3), np.float32)
        norm = np.empty((nv, 3), np.float32)
        uv = np.empty((nv, 2), np.float32)
        tris = np.empty((nt, 3), np.int64)
        lib.fov_obj_copy(
            h, _fp(pos), _fp(norm), _fp(uv),
            tris.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        )
        has_n = bool(lib.fov_obj_has_normals(h))
        has_uv = bool(lib.fov_obj_has_uvs(h))
    finally:
        lib.fov_obj_free(h)
    return pos, tris, (norm if has_n else None), (uv if has_uv else None)
