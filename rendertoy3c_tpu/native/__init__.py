"""ctypes bindings for the native (C++) host runtime.

The reference's host layer is C++ (scene loading via tinyobj, BVH builds via
optixAccelBuild); our equivalents live in native/*.cc, compiled to
librendertoy_native.so and bound here via ctypes (pybind11 is not available
in this environment). Every entry point has a pure-Python fallback — the
native path is a scene-load accelerator, not a correctness dependency.

Build: `make -C native/` (done automatically on first import when a C++
toolchain is present).
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native",
)
_SO_PATH = os.path.join(_NATIVE_DIR, "librendertoy_native.so")

_lib = None
_load_attempted = False


def _build() -> bool:
    try:
        subprocess.run(
            ["make", "-C", _NATIVE_DIR],
            check=True, capture_output=True, timeout=120,
        )
        return os.path.exists(_SO_PATH)
    except Exception:
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native library; None if unavailable."""
    global _lib, _load_attempted
    if _lib is not None or _load_attempted:
        return _lib
    _load_attempted = True
    if not os.path.exists(_SO_PATH):
        src = os.path.join(_NATIVE_DIR, "lbvh.cc")
        if not (os.path.exists(src) and _build()):
            return None
    try:
        lib = ctypes.CDLL(_SO_PATH)
    except OSError:
        return None

    lib.rt_build_bvh8.restype = ctypes.c_int
    lib.rt_build_bvh8.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
        ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_int32), ctypes.c_int,
    ]
    lib.rt_obj_parse.restype = ctypes.c_void_p
    lib.rt_obj_parse.argtypes = [ctypes.c_char_p]
    lib.rt_obj_counts.restype = None
    lib.rt_obj_counts.argtypes = [ctypes.c_void_p,
                                  ctypes.POINTER(ctypes.c_int64)]
    lib.rt_obj_fetch.restype = None
    lib.rt_obj_fetch.argtypes = [
        ctypes.c_void_p,
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_int32),
        ctypes.c_char_p, ctypes.c_char_p,
    ]
    lib.rt_obj_free.restype = None
    lib.rt_obj_free.argtypes = [ctypes.c_void_p]
    if hasattr(lib, "rt_sah_split_perm"):  # absent in pre-sah.cc builds
        lib.rt_sah_split_perm.restype = ctypes.c_int64
        lib.rt_sah_split_perm.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
            ctypes.c_int64, ctypes.c_int32, ctypes.c_int32,
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int64,
        ]
    _lib = lib
    return _lib


def _fptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def _iptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))


def native_build_bvh8(lo: np.ndarray, hi: np.ndarray, max_leaf: int):
    """C++ LBVH build over per-triangle AABBs.

    Returns (perm [n], child_lo [N,8,3], child_hi [N,8,3], child [N,8]) or
    None when the native library is unavailable.
    """
    lib = get_lib()
    if lib is None:
        return None
    lo = np.ascontiguousarray(lo, np.float32)
    hi = np.ascontiguousarray(hi, np.float32)
    n = lo.shape[0]
    cap = max(2 * n // max(max_leaf, 1) + 16, 16)
    perm = np.empty(n, np.int32)
    child_lo = np.empty((cap, 8, 3), np.float32)
    child_hi = np.empty((cap, 8, 3), np.float32)
    child = np.empty((cap, 8), np.int32)
    nw = lib.rt_build_bvh8(_fptr(lo), _fptr(hi), n, max_leaf, _iptr(perm),
                           _fptr(child_lo), _fptr(child_hi), _iptr(child), cap)
    if nw == -1:  # capacity miss (degenerate splits); retry with slack
        cap = 4 * n + 64
        child_lo = np.empty((cap, 8, 3), np.float32)
        child_hi = np.empty((cap, 8, 3), np.float32)
        child = np.empty((cap, 8), np.int32)
        nw = lib.rt_build_bvh8(_fptr(lo), _fptr(hi), n, max_leaf, _iptr(perm),
                               _fptr(child_lo), _fptr(child_hi), _iptr(child),
                               cap)
    if nw < 0:
        return None
    return perm, child_lo[:nw], child_hi[:nw], child[:nw]


def native_sah_split_perm(lo: np.ndarray, hi: np.ndarray, leaf: int,
                          variable: bool):
    """C++ binned-SAH split ordering (native/sah.cc) — bit-identical to
    accel.lbvh.sah_split_perm's pure-Python path (asserted by
    tests/test_native.py). Returns the [M] permutation (with -1 padding
    slots when variable) or None when the library is unavailable."""
    lib = get_lib()
    if lib is None or not hasattr(lib, "rt_sah_split_perm"):
        return None
    lo = np.ascontiguousarray(lo, np.float32)
    hi = np.ascontiguousarray(hi, np.float32)
    n = lo.shape[0]
    # worst case for variable: every cluster holds one prim -> n * leaf,
    # but fill >= ~1/2 in practice; allocate 3x + slack and retry once
    cap = 3 * n + 16 * leaf if variable else n
    for _ in range(2):
        out = np.empty(cap, np.int32)
        m = lib.rt_sah_split_perm(_fptr(lo), _fptr(hi), n, leaf,
                                  1 if variable else 0, _iptr(out), cap)
        if m >= 0:
            return out[:m]
        cap = n * max(leaf, 1) + 16 * leaf
    return None


def native_parse_obj(path: str):
    """C++ OBJ geometry parse.

    Returns a dict with keys v [nv,3], vn [nn,3], vt [nt,2],
    face_idx [nf,3,3] (corner x (v,t,n) 0-based, -1 = absent),
    face_mat [nf], face_shape [nf], mat_names list[str], mtllibs list[str];
    or None when the native library is unavailable.
    """
    lib = get_lib()
    if lib is None:
        return None
    handle = lib.rt_obj_parse(path.encode())
    if not handle:
        return None
    try:
        counts = (ctypes.c_int64 * 6)()
        lib.rt_obj_counts(handle, counts)
        nv, nn, nt, nf, nm, nl = (int(c) for c in counts)
        v = np.empty((max(nv, 1), 3), np.float32)
        vn = np.empty((max(nn, 1), 3), np.float32)
        vt = np.empty((max(nt, 1), 2), np.float32)
        face_idx = np.empty((max(nf, 1), 9), np.int32)
        face_mat = np.empty(max(nf, 1), np.int32)
        face_shape = np.empty(max(nf, 1), np.int32)
        mat_names = ctypes.create_string_buffer(max(nm, 1))
        mtllibs = ctypes.create_string_buffer(max(nl, 1))
        lib.rt_obj_fetch(handle, _fptr(v), _fptr(vn), _fptr(vt),
                         _iptr(face_idx), _iptr(face_mat), _iptr(face_shape),
                         mat_names, mtllibs)
        return dict(
            v=v[:nv], vn=vn[:nn], vt=vt[:nt],
            face_idx=face_idx[:nf].reshape(nf, 3, 3),
            face_mat=face_mat[:nf], face_shape=face_shape[:nf],
            mat_names=(mat_names.raw[:nm].decode().split("\n") if nm else []),
            mtllibs=(mtllibs.raw[:nl].decode().split("\n") if nl else []),
        )
    finally:
        lib.rt_obj_free(handle)
