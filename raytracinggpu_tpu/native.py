"""ctypes bindings for the native host runtime (native/librt_native.so).

The reference's entire host pipeline is C++ (readOBJ, buildBVH, stb PNG);
this module exposes the framework's native equivalents with a transparent
fallback to the numpy implementations when the library isn't built.  The
numpy paths stay canonical; tests assert both produce identical results.

Disable with RT_NATIVE=0; rebuild with ``make -C native``.
"""
from __future__ import annotations

import ctypes
import os
from functools import lru_cache

import numpy as np

_LIB_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "native",
    "librt_native.so",
)

_f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
_i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
_u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")


@lru_cache(maxsize=1)
def load() -> ctypes.CDLL | None:
    """Load the native library; None when unavailable or disabled."""
    if os.environ.get("RT_NATIVE", "1") == "0":
        return None
    if not os.path.exists(_LIB_PATH):
        return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None
    lib.rt_obj_parse.restype = ctypes.c_void_p
    lib.rt_obj_parse.argtypes = [ctypes.c_char_p, ctypes.c_int]
    lib.rt_obj_counts.restype = ctypes.c_int64
    lib.rt_obj_counts.argtypes = [ctypes.c_void_p, ctypes.c_int]
    lib.rt_obj_copy.argtypes = [
        ctypes.c_void_p, _f32p, _f32p, _f32p, _i32p, _i32p, _i32p,
    ]
    lib.rt_obj_free.argtypes = [ctypes.c_void_p]

    lib.rt_bvh_build.restype = ctypes.c_void_p
    lib.rt_bvh_build.argtypes = [_f32p, _f32p, _f32p, ctypes.c_int64]
    lib.rt_bvh_n_nodes.restype = ctypes.c_int64
    lib.rt_bvh_n_nodes.argtypes = [ctypes.c_void_p]
    lib.rt_bvh_copy.argtypes = [
        ctypes.c_void_p, _i32p, _i32p, _i32p, _i32p, _i32p, _f32p, _f32p, _i32p,
    ]
    lib.rt_bvh_free.argtypes = [ctypes.c_void_p]

    lib.rt_png_write.restype = ctypes.c_int
    lib.rt_png_write.argtypes = [ctypes.c_char_p, ctypes.c_int32,
                                 ctypes.c_int32, _u8p]
    return lib


def available() -> bool:
    return load() is not None


def parse_obj(path: str, embed_transform: bool):
    """Native OBJ parse; returns the same field tuple as scene.obj.read_obj
    or None when the library is unavailable."""
    lib = load()
    if lib is None:
        return None
    h = lib.rt_obj_parse(path.encode(), int(embed_transform))
    if not h:
        raise FileNotFoundError(path)
    try:
        nv = lib.rt_obj_counts(h, 0)
        nn = lib.rt_obj_counts(h, 1)
        nu = lib.rt_obj_counts(h, 2)
        nt = lib.rt_obj_counts(h, 3)
        vertices = np.empty((nv, 3), np.float32)
        normals = np.empty((nn, 3), np.float32)
        uvs = np.empty((nu, 3), np.float32)
        fv = np.empty((nt, 3), np.int32)
        fn = np.empty((nt, 3), np.int32)
        fu = np.empty((nt, 3), np.int32)
        lib.rt_obj_copy(h, vertices, normals, uvs, fv, fn, fu)
        return vertices, normals, uvs, fv, fn, fu
    finally:
        lib.rt_obj_free(h)


def build_bvh(A: np.ndarray, B: np.ndarray, C: np.ndarray):
    """Native BVH build; returns the FlatBVH field tuple
    (left, right, start, end, skip, mn, mx, order) or None."""
    lib = load()
    if lib is None:
        return None
    A = np.ascontiguousarray(A, np.float32)
    B = np.ascontiguousarray(B, np.float32)
    C = np.ascontiguousarray(C, np.float32)
    T = A.shape[0]
    h = lib.rt_bvh_build(A, B, C, T)
    try:
        n = lib.rt_bvh_n_nodes(h)
        left = np.empty(n, np.int32)
        right = np.empty(n, np.int32)
        start = np.empty(n, np.int32)
        end = np.empty(n, np.int32)
        skip = np.empty(n, np.int32)
        mn = np.empty((n, 3), np.float32)
        mx = np.empty((n, 3), np.float32)
        order = np.empty(T, np.int32)
        lib.rt_bvh_copy(h, left, right, start, end, skip, mn, mx, order)
        return left, right, start, end, skip, mn, mx, order
    finally:
        lib.rt_bvh_free(h)


def write_png(path: str, rgb: np.ndarray) -> bool:
    """Native PNG encode; returns False when unavailable."""
    lib = load()
    if lib is None:
        return False
    rgb = np.ascontiguousarray(rgb, np.uint8)
    h, w, c = rgb.shape
    assert c == 3
    return lib.rt_png_write(path.encode(), w, h, rgb) == 0
