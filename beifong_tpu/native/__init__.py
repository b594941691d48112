"""ctypes bindings for the native C++ runtime components.

The reference's performance-critical host code is C++ (embree/kdtree accel
build, OBJ/PLY loaders in `src/shapes/`); here the equivalents live in
`bvh_builder.cpp` and are loaded via ctypes (the image has no pybind11).
Python fallbacks kick in automatically when the library isn't built.

Build once with:  make -C beifong_tpu/native
(or it is built on demand on first use if a compiler is available).
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_DIR, "libbeifong_native.so")
_lib = None
_tried = False


def _load():
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_LIB_PATH):
        try:
            subprocess.run(["make", "-C", _DIR], check=True,
                           capture_output=True, timeout=120)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None
    f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
    i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
    lib.beifong_build_bvh.restype = ctypes.c_int
    lib.beifong_build_bvh.argtypes = [
        f32p, f32p, f32p, ctypes.c_int, ctypes.c_int,
        f32p, f32p, i32p, i32p, i32p, i32p, i32p]
    lib.beifong_parse_obj_counts.restype = ctypes.c_int
    lib.beifong_parse_obj_counts.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int)]
    lib.beifong_parse_obj.restype = ctypes.c_int
    lib.beifong_parse_obj.argtypes = [ctypes.c_char_p, f32p, i32p]
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def build_bvh_arrays(v0: np.ndarray, e1: np.ndarray, e2: np.ndarray,
                     leaf_size: int):
    """Native threaded-BVH build; returns the same arrays as the Python
    builder in geometry/bvh.py or None if the library is unavailable."""
    lib = _load()
    if lib is None:
        return None
    n = len(v0)
    cap = 2 * n + 4
    bb_min = np.empty((cap, 3), np.float32)
    bb_max = np.empty((cap, 3), np.float32)
    hit = np.empty(cap, np.int32)
    miss = np.empty(cap, np.int32)
    loff = np.empty(cap, np.int32)
    lcnt = np.empty(cap, np.int32)
    order = np.empty(n, np.int32)
    n_nodes = lib.beifong_build_bvh(
        np.ascontiguousarray(v0, np.float32),
        np.ascontiguousarray(e1, np.float32),
        np.ascontiguousarray(e2, np.float32),
        n, leaf_size, bb_min.reshape(-1), bb_max.reshape(-1), hit, miss,
        loff, lcnt, order)
    if n_nodes <= 0:
        return None
    s = slice(0, n_nodes)
    return (bb_min[s], bb_max[s], hit[s], miss[s], loff[s], lcnt[s], order)


def parse_obj(path: str):
    """Native OBJ parse -> (verts (V,3) f32, faces (F,3) i32) or None."""
    lib = _load()
    if lib is None:
        return None
    nv = ctypes.c_int()
    nf = ctypes.c_int()
    if lib.beifong_parse_obj_counts(path.encode(), ctypes.byref(nv),
                                    ctypes.byref(nf)) != 0:
        return None
    verts = np.empty((nv.value, 3), np.float32)
    faces = np.empty((nf.value, 3), np.int32)
    got = lib.beifong_parse_obj(path.encode(), verts.reshape(-1),
                                faces.reshape(-1))
    if got < 0:
        return None
    return verts, faces[:got]
