"""ctypes binding for the native 2-bit read packer (native/pack2.cpp;
build with native/build.sh).

Raises ImportError when the shared library has not been built — the
caller (ops/sketch.pack_reads) falls back to the NumPy path, which
produces identical outputs (asserted by tests/test_mapper_extras.py).
"""

import ctypes
import os

import numpy as np

_LIB_PATH = os.path.join(os.path.dirname(__file__), "_native",
                         "libpack2.so")
if not os.path.exists(_LIB_PATH):
    raise ImportError(f"native pack2 not built ({_LIB_PATH}); "
                      "run native/build.sh")

_lib = ctypes.CDLL(_LIB_PATH)
_lib.cga_pack2.restype = ctypes.c_void_p
_lib.cga_pack2.argtypes = [ctypes.c_void_p, ctypes.c_long, ctypes.c_long,
                           ctypes.c_void_p, ctypes.c_void_p]
_lib.cga_pack2_n.restype = ctypes.c_long
_lib.cga_pack2_n.argtypes = [ctypes.c_void_p]
_lib.cga_pack2_rows.restype = ctypes.POINTER(ctypes.c_int32)
_lib.cga_pack2_rows.argtypes = [ctypes.c_void_p]
_lib.cga_pack2_cols.restype = ctypes.POINTER(ctypes.c_int32)
_lib.cga_pack2_cols.argtypes = [ctypes.c_void_p]
_lib.cga_pack2_free.argtypes = [ctypes.c_void_p]


def pack2(reads: np.ndarray, lens: np.ndarray):
    """One-pass 2-bit pack of an encoded (B, L) int8 read matrix.
    Returns (packed (B, L//4) uint8, n_rows (n,) int32, n_cols (n,)
    int32) — bit-identical to ops/sketch.pack_reads' NumPy path."""
    B, L = reads.shape
    assert L % 4 == 0, L
    reads = np.ascontiguousarray(reads, dtype=np.int8)
    lens = np.ascontiguousarray(lens, dtype=np.int32)
    packed = np.empty((B, L // 4), dtype=np.uint8)
    h = _lib.cga_pack2(reads.ctypes.data_as(ctypes.c_void_p), B, L,
                       lens.ctypes.data_as(ctypes.c_void_p),
                       packed.ctypes.data_as(ctypes.c_void_p))
    try:
        n = _lib.cga_pack2_n(h)
        if n:
            rows = np.ctypeslib.as_array(_lib.cga_pack2_rows(h),
                                         shape=(n,)).copy()
            cols = np.ctypeslib.as_array(_lib.cga_pack2_cols(h),
                                         shape=(n,)).copy()
        else:
            rows = np.empty(0, np.int32)
            cols = np.empty(0, np.int32)
    finally:
        _lib.cga_pack2_free(h)
    return packed, rows, cols
