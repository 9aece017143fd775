"""ctypes bindings for the native runtime helpers, with NumPy fallbacks.

Each function transparently falls back to the pure-NumPy implementation
in io/n3tree.py when the shared library is unavailable (e.g. no compiler
in a deployment image).
"""

from __future__ import annotations

import ctypes
from typing import Optional

import numpy as np

_lib: Optional[ctypes.CDLL] = None
_tried = False


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    from .build import ensure_built
    path = ensure_built()
    if path is None:
        return None
    try:
        lib = ctypes.CDLL(path)
        i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
        u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
        u16p = np.ctypeslib.ndpointer(np.uint16, flags="C_CONTIGUOUS")
        i64p = ctypes.POINTER(ctypes.c_int64)

        lib.rtn_tree_max_depth.argtypes = [i32p, ctypes.c_int64,
                                           ctypes.c_int32]
        lib.rtn_tree_max_depth.restype = ctypes.c_int32

        lib.rtn_build_jump_lut.argtypes = [
            i32p, ctypes.c_int64, ctypes.c_int32, ctypes.c_int32, i32p, u8p]
        lib.rtn_build_jump_lut.restype = None

        lib.rtn_decode_quant.argtypes = [
            u16p, u16p, u16p, ctypes.c_void_p, ctypes.c_int32,
            ctypes.c_int32, ctypes.c_int64, ctypes.c_int32, u16p]
        lib.rtn_decode_quant.restype = None

        lib.rtn_count_leaves.argtypes = [i32p, ctypes.c_int64, i64p, i64p]
        lib.rtn_count_leaves.restype = None
        _lib = lib
    except Exception:
        _lib = None
    return _lib


def tree_max_depth(child: np.ndarray, N3: int) -> Optional[int]:
    lib = get_lib()
    if lib is None:
        return None
    child = np.ascontiguousarray(child, np.int32)
    d = lib.rtn_tree_max_depth(child, child.size // N3, N3)
    return None if d < 0 else int(d)


def build_jump_lut(child: np.ndarray, N: int, levels: int):
    """Returns (ptr int32[res^3], depth uint8[res^3]) or None."""
    lib = get_lib()
    if lib is None:
        return None
    child = np.ascontiguousarray(child, np.int32)
    res = N ** levels
    ptr = np.empty(res ** 3, np.int32)
    depth = np.empty(res ** 3, np.uint8)
    lib.rtn_build_jump_lut(child, child.size // (N ** 3), N, levels, ptr,
                           depth)
    return ptr, depth


def decode_quant(quant_colors, quant_map, sigma, retained, data_dim: int):
    lib = get_lib()
    if lib is None:
        return None
    n_q, n_child = quant_map.shape
    n_retain = 0 if retained is None else retained.shape[0]
    qc = np.ascontiguousarray(quant_colors).view(np.uint16).reshape(n_q, -1)
    qm = np.ascontiguousarray(quant_map, np.uint16)
    sg = np.ascontiguousarray(sigma).view(np.uint16).reshape(-1)
    out = np.empty((n_child, data_dim), np.uint16)
    ret_ptr = None
    ret_arr = None
    if retained is not None:
        ret_arr = np.ascontiguousarray(retained).view(np.uint16)
        ret_ptr = ret_arr.ctypes.data_as(ctypes.c_void_p)
    lib.rtn_decode_quant(qc, qm, sg, ret_ptr, n_q, n_retain, n_child,
                         data_dim, out)
    return out.view(np.float16)
