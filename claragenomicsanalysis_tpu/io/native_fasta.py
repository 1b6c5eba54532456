"""ctypes binding for the native C++ FASTA/FASTQ parser
(native/fasta_parser.cpp; build with native/build.sh).

Raises ImportError when the shared library has not been built — callers
(io/fasta.create_fasta_parser) fall back to the pure-Python parser, which
produces identical records (asserted by tests/test_native_fasta.py).
"""

import ctypes
import os

_LIB_PATH = os.path.join(os.path.dirname(__file__), "_native", "libfasta.so")
if not os.path.exists(_LIB_PATH):
    raise ImportError(f"native fasta parser not built ({_LIB_PATH}); "
                      "run native/build.sh")

_lib = ctypes.CDLL(_LIB_PATH)
_lib.cga_fasta_open.restype = ctypes.c_void_p
_lib.cga_fasta_open.argtypes = [ctypes.c_char_p]
_lib.cga_fasta_num_records.restype = ctypes.c_long
_lib.cga_fasta_num_records.argtypes = [ctypes.c_void_p]
_lib.cga_fasta_name.restype = ctypes.c_char_p
_lib.cga_fasta_name.argtypes = [ctypes.c_void_p, ctypes.c_long]
_lib.cga_fasta_seq.restype = ctypes.c_void_p  # manual copy with length
_lib.cga_fasta_seq.argtypes = [ctypes.c_void_p, ctypes.c_long]
_lib.cga_fasta_seq_len.restype = ctypes.c_long
_lib.cga_fasta_seq_len.argtypes = [ctypes.c_void_p, ctypes.c_long]
_lib.cga_fasta_error.restype = ctypes.c_char_p
_lib.cga_fasta_error.argtypes = [ctypes.c_void_p]
_lib.cga_fasta_close.argtypes = [ctypes.c_void_p]


def parse(path: str) -> list[tuple[str, str]]:
    """Parse a FASTA/FASTQ file (plain or gzip).  Returns [(name, seq)].
    Raises ValueError on malformed input (same contract as the Python
    parser)."""
    h = _lib.cga_fasta_open(path.encode())
    if not h:
        raise MemoryError("native parser allocation failed")
    try:
        err = _lib.cga_fasta_error(h)
        if err:
            raise ValueError(f"{path}: {err.decode()}")
        n = _lib.cga_fasta_num_records(h)
        out = []
        for i in range(n):
            name = _lib.cga_fasta_name(h, i).decode()
            ln = _lib.cga_fasta_seq_len(h, i)
            ptr = _lib.cga_fasta_seq(h, i)
            seq = ctypes.string_at(ptr, ln).decode()
            out.append((name, seq))
        return out
    finally:
        _lib.cga_fasta_close(h)
