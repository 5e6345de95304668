"""ctypes bindings for the native ingest library (ingest.cpp).

The library is compiled lazily on first use (g++ is baked into the image)
and cached next to the source; every consumer falls back to the pure-Python
parsers when the toolchain or binary is unavailable.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Iterator, Optional

import numpy as np

_HERE = os.path.dirname(__file__)
_SRC = os.path.join(_HERE, "ingest.cpp")
_SO = os.path.join(_HERE, "libeagleingest.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_lib_failed = False


def _build() -> bool:
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-pthread", "-std=c++17",
           _SRC, "-o", _SO + ".tmp"]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        os.replace(_SO + ".tmp", _SO)
        return True
    except Exception:
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native library; None if unavailable."""
    global _lib, _lib_failed
    if _lib is not None or _lib_failed:
        return _lib
    with _lock:
        if _lib is not None or _lib_failed:
            return _lib
        if not os.path.exists(_SO) or (
            os.path.exists(_SRC)
            and os.path.getmtime(_SRC) > os.path.getmtime(_SO)
        ):
            if not _build():
                _lib_failed = True
                return None
        try:
            lib = ctypes.CDLL(_SO)
        except OSError:
            _lib_failed = True
            return None
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
        lib.ee_ascii_close.restype = None
        lib.ee_ascii_close.argtypes = [ctypes.c_void_p]
        lib.ee_vcf_open.restype = ctypes.c_void_p
        lib.ee_vcf_open.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
        ]
        lib.ee_vcf_next.restype = ctypes.c_int64
        lib.ee_vcf_next.argtypes = [
            ctypes.c_void_p,
            np.ctypeslib.ndpointer(dtype=np.int8, flags="C_CONTIGUOUS"),
            np.ctypeslib.ndpointer(dtype=np.int64, flags="C_CONTIGUOUS"),
            np.ctypeslib.ndpointer(dtype=np.uint8, flags="C_CONTIGUOUS"),
            np.ctypeslib.ndpointer(dtype=np.uint8, flags="C_CONTIGUOUS"),
            ctypes.c_int64,
        ]
        lib.ee_vcf_close.restype = None
        lib.ee_vcf_close.argtypes = [ctypes.c_void_p]
        lib.ee_pack2.restype = None
        lib.ee_pack2.argtypes = [
            np.ctypeslib.ndpointer(dtype=np.int8, flags="C_CONTIGUOUS"),
            np.ctypeslib.ndpointer(dtype=np.uint8, flags="C_CONTIGUOUS"),
            ctypes.c_int64,
        ]
        lib.ee_unpack2.restype = None
        lib.ee_unpack2.argtypes = [
            np.ctypeslib.ndpointer(dtype=np.uint8, flags="C_CONTIGUOUS"),
            np.ctypeslib.ndpointer(dtype=np.int8, flags="C_CONTIGUOUS"),
            ctypes.c_int64,
        ]
        _lib = lib
        return _lib


def iter_ascii_blocks_native(
    path: str, AA: str, AB: str, BB: str, missing: str,
    block_rows: int = 4096,
) -> Optional[Iterator[np.ndarray]]:
    """Native streamed ASCII recode; None if the library is unavailable or
    the codes don't fit the native fast path (multi-char no-space codes)."""
    lib = get_lib()
    if lib is None:
        return None

    n_rows = ctypes.c_int64()
    n_cols = ctypes.c_int64()
    nospace = ctypes.c_int()
    handle = lib.ee_ascii_open(
        path.encode(), AA.encode(), AB.encode(), BB.encode(),
        missing.encode(), ctypes.byref(n_rows), ctypes.byref(n_cols),
        ctypes.byref(nospace),
    )
    if not handle:
        raise ValueError(f"empty or unreadable genotype file: {path}")
    if nospace.value and not (len(AA) == len(AB) == len(BB) == 1):
        # native LUT path needs single-char codes; caller falls back
        lib.ee_ascii_close(handle)
        return None

    def gen():
        p = n_cols.value
        try:
            while True:
                buf = np.empty((block_rows, p), dtype=np.int8)
                got = lib.ee_ascii_next(handle, buf, block_rows)
                if got < 0:
                    raise ValueError(
                        f"unrecognized genotype token at data row "
                        f"{-got} of a block in {path}"
                    )
                if got == 0:
                    break
                yield buf[:got]
        finally:
            lib.ee_ascii_close(handle)

    return gen()


_VCF_CHROM_W, _VCF_ID_W = 64, 128  # ingest.cpp kChromW / kIdW


def iter_vcf_blocks_native(
    path: str, block_snps: int = 4096
) -> Optional[Iterator[tuple]]:
    """Native streamed VCF GT scan (multithreaded mmap'd recode); yields
    the same ``(geno [n × b], names, chroms, pos)`` tuples as the Python
    ``parsers.iter_vcf_blocks``. None when the library is unavailable or
    the file lacks a #CHROM header (the Python parser then raises the
    descriptive error)."""
    lib = get_lib()
    if lib is None:
        return None
    # probe open/close to decide native-vs-fallback WITHOUT holding the
    # mmap + line index hostage to a generator that may never be iterated;
    # gen() reopens (one extra memchr pass over the mapping — negligible
    # next to the GT scan)
    n_samples = ctypes.c_int64()
    n_variants = ctypes.c_int64()
    probe = lib.ee_vcf_open(
        path.encode(), ctypes.byref(n_samples), ctypes.byref(n_variants)
    )
    if not probe:
        return None
    lib.ee_vcf_close(probe)

    def gen():
        n = n_samples.value
        handle = lib.ee_vcf_open(
            path.encode(), ctypes.byref(ctypes.c_int64()),
            ctypes.byref(ctypes.c_int64()),
        )
        if not handle:
            raise ValueError(f"VCF became unreadable between open and "
                             f"scan: {path}")
        try:
            while True:
                dose = np.empty((block_snps, n), dtype=np.int8)
                pos = np.empty(block_snps, dtype=np.int64)
                chrom = np.empty((block_snps, _VCF_CHROM_W), dtype=np.uint8)
                vid = np.empty((block_snps, _VCF_ID_W), dtype=np.uint8)
                got = lib.ee_vcf_next(handle, dose, pos, chrom, vid,
                                      block_snps)
                if got < 0:
                    raise ValueError(
                        f"malformed VCF record at data row {-got} of a "
                        f"block in {path} (bad GT/POS field, oversized "
                        f"CHROM/ID, or field-count mismatch)"
                    )
                if got == 0:
                    break
                chroms = [
                    bytes(chrom[r]).rstrip(b"\x00").decode()
                    for r in range(got)
                ]
                ids = [
                    bytes(vid[r]).rstrip(b"\x00").decode()
                    for r in range(got)
                ]
                poss = [int(x) for x in pos[:got]]
                names = [
                    ids[r] if ids[r] != "." else f"{chroms[r]}:{poss[r]}"
                    for r in range(got)
                ]
                yield dose[:got].T, names, chroms, poss
        finally:
            lib.ee_vcf_close(handle)

    return gen()


def vcf_dims_native(path: str) -> Optional[tuple[int, int]]:
    """(n_samples, n_variants) via the native header scan; None if
    unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    n_samples = ctypes.c_int64()
    n_variants = ctypes.c_int64()
    handle = lib.ee_vcf_open(
        path.encode(), ctypes.byref(n_samples), ctypes.byref(n_variants)
    )
    if not handle:
        return None
    lib.ee_vcf_close(handle)
    return int(n_samples.value), int(n_variants.value)


def pack2(geno: np.ndarray) -> np.ndarray:
    """int8 {0,1,2,-9} → 2-bit packed bytes (missing = code 3)."""
    flat = np.ascontiguousarray(geno, dtype=np.int8).reshape(-1)
    out = np.empty((flat.size + 3) // 4, dtype=np.uint8)
    lib = get_lib()
    if lib is not None:
        lib.ee_pack2(flat, out, flat.size)
        return out
    codes = np.where(flat == -9, 3, flat).astype(np.uint8)
    pad = (-codes.size) % 4
    if pad:
        codes = np.concatenate([codes, np.zeros(pad, dtype=np.uint8)])
    q = codes.reshape(-1, 4)
    return (q[:, 0] | (q[:, 1] << 2) | (q[:, 2] << 4) | (q[:, 3] << 6)).astype(np.uint8)


def unpack2(packed: np.ndarray, count: int) -> np.ndarray:
    """Inverse of :func:`pack2`: 2-bit codes → int8 {0,1,2,-9}."""
    packed = np.ascontiguousarray(packed, dtype=np.uint8)
    out = np.empty(count, dtype=np.int8)
    lib = get_lib()
    if lib is not None:
        lib.ee_unpack2(packed, out, count)
        return out
    b = packed[: (count + 3) // 4]
    codes = np.stack([(b >> s) & 3 for s in (0, 2, 4, 6)], axis=1).reshape(-1)[:count]
    return np.where(codes == 3, -9, codes).astype(np.int8)
