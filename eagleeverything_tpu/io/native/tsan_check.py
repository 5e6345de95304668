"""ThreadSanitizer self-check for the multithreaded native ingest.

Run via ``make tsan`` in this directory: loads the TSAN-instrumented
library, parses a generated multi-block ASCII file with the threaded
recode path, and fails on any TSAN report (TSAN aborts the process with
a nonzero exit on a race by default).
"""

import ctypes
import os
import sys
import tempfile

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))


def main() -> int:
    lib = ctypes.CDLL(os.path.join(HERE, "libeagleingest_tsan.so"))
    lib.ee_ascii_open.restype = ctypes.c_void_p
    lib.ee_ascii_open.argtypes = [
        ctypes.c_char_p, ctypes.c_char_p, ctypes.c_char_p,
        ctypes.c_char_p, ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_int),
    ]
    lib.ee_ascii_next.restype = ctypes.c_int64
    lib.ee_ascii_next.argtypes = [
        ctypes.c_void_p,
        np.ctypeslib.ndpointer(dtype=np.int8, flags="C_CONTIGUOUS"),
        ctypes.c_int64,
    ]
    lib.ee_ascii_close.argtypes = [ctypes.c_void_p]

    rng = np.random.default_rng(0)
    n, p = 512, 400
    codes = np.array(["AA", "AB", "BB"])
    with tempfile.NamedTemporaryFile("w", suffix=".txt", delete=False) as f:
        path = f.name
        for _ in range(n):
            f.write(" ".join(codes[rng.integers(0, 3, p)]) + "\n")
    try:
        nr = ctypes.c_int64()
        nc = ctypes.c_int64()
        ns = ctypes.c_int()
        h = lib.ee_ascii_open(path.encode(), b"AA", b"AB", b"BB", b"NA",
                              ctypes.byref(nr), ctypes.byref(nc),
                              ctypes.byref(ns))
        assert h and nr.value == n and nc.value == p
        total = 0
        while True:
            buf = np.empty((128, p), dtype=np.int8)
            got = lib.ee_ascii_next(h, buf, 128)
            assert got >= 0, f"parse error {got}"
            if got == 0:
                break
            total += got
        lib.ee_ascii_close(h)
        assert total == n
        print("TSAN ingest check passed:", total, "rows")
        return 0
    finally:
        os.unlink(path)


if __name__ == "__main__":
    sys.exit(main())
