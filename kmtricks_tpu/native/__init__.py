"""Native host codecs (C++ via ctypes) with transparent pure-Python fallback.

``lib()`` returns the loaded shared library, building it with g++ on first
use (cached under this directory). Callers must handle ``None`` (no
compiler / build failure) by falling back to the Python implementations.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(__file__)
_SRC = os.path.join(_HERE, "kmtricks_native.cpp")
_SO = os.path.join(_HERE, "_kmtricks_native.so")
_lock = threading.Lock()
_lib = None
_tried = False


def build(force: bool = False) -> str | None:
    if os.path.exists(_SO) and not force and \
            os.path.getmtime(_SO) >= os.path.getmtime(_SRC):
        return _SO
    # build to a private temp path and rename atomically: concurrent
    # module processes (the shared-run-dir workflow) may race the build
    tmp = f"{_SO}.{os.getpid()}.tmp"
    cmd = ["g++", "-O3", "-march=native", "-std=c++17", "-shared", "-fPIC",
           _SRC, "-o", tmp]
    try:
        subprocess.run(cmd, check=True, capture_output=True)
        os.replace(tmp, _SO)
        return _SO
    except (subprocess.CalledProcessError, FileNotFoundError, OSError):
        try:
            os.unlink(tmp)
        except OSError:
            pass
        return None


def lib():
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        so = build()
        if so is None:
            return None
        L = ctypes.CDLL(so)
        L.km_xxh32.restype = ctypes.c_uint32
        L.km_xxh32.argtypes = [ctypes.c_char_p, ctypes.c_size_t,
                               ctypes.c_uint32]
        L.km_xxh64.restype = ctypes.c_uint64
        L.km_xxh64.argtypes = [ctypes.c_char_p, ctypes.c_size_t,
                               ctypes.c_uint64]
        L.km_xxh64_batch.restype = None
        L.km_xxh64_batch.argtypes = [ctypes.c_void_p, ctypes.c_size_t,
                                     ctypes.c_size_t, ctypes.c_uint64,
                                     ctypes.c_void_p]
        L.km_lz4_decompress_block.restype = ctypes.c_int64
        L.km_lz4_decompress_block.argtypes = [ctypes.c_char_p,
                                              ctypes.c_size_t,
                                              ctypes.c_void_p,
                                              ctypes.c_size_t]
        L.km_lz4_compress_block.restype = ctypes.c_int64
        L.km_lz4_compress_block.argtypes = [ctypes.c_char_p,
                                            ctypes.c_size_t,
                                            ctypes.c_void_p,
                                            ctypes.c_size_t]
        L.km_pack_superkmer.restype = ctypes.c_int64
        L.km_pack_superkmer.argtypes = [ctypes.c_void_p, ctypes.c_int,
                                        ctypes.c_int, ctypes.c_void_p]
        L.km_unpack_superkmer.restype = ctypes.c_int64
        L.km_unpack_superkmer.argtypes = [ctypes.c_char_p, ctypes.c_int,
                                          ctypes.c_int, ctypes.c_void_p]
        for fn in (L.km_fasta_batch, L.km_fastq_batch):
            fn.restype = ctypes.c_int64
            fn.argtypes = [ctypes.c_char_p, ctypes.c_size_t,
                           ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64,
                           ctypes.c_void_p, ctypes.c_void_p]
        L.km_lpt_distrib.restype = ctypes.c_int64
        L.km_lpt_distrib.argtypes = [ctypes.c_void_p, ctypes.c_uint64,
                                     ctypes.c_int, ctypes.c_void_p]
        L.km_bam_batch.restype = ctypes.c_int64
        L.km_bam_batch.argtypes = [
            ctypes.c_char_p, ctypes.c_size_t,            # data, len
            ctypes.c_int64, ctypes.c_void_p,             # n_refs, excl mask
            ctypes.c_uint32, ctypes.c_uint32,            # -f, -F flags
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64,  # batch, rows, L
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p]
        L.km_pack2bit_t.restype = ctypes.c_int64
        L.km_pack2bit_t.argtypes = [
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64,  # batch, B, L
            ctypes.c_void_p, ctypes.c_void_p,         # out (L/4,B), counts
            ctypes.c_int64, ctypes.c_int64]           # row range
        L.km_bf_fill.restype = ctypes.c_int64
        L.km_bf_fill.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p,         # counts, hashes
            ctypes.c_int64, ctypes.c_int64,           # n, nsamp
            ctypes.c_void_p, ctypes.c_int64,          # rows, nb
            ctypes.c_int64, ctypes.c_int64]           # slice range
        _lib = L
        return _lib


# -- typed wrappers ---------------------------------------------------------

def pack2bit_t(batch: np.ndarray, threads: int = 1):
    """ASCII (B, L) rows -> ((L/4, B) 2-bit packed TRANSPOSED uint8,
    (B,) int32 per-row ACGT byte counts) in one fused native pass —
    the streaming engine's chunk pack (replaces numpy's
    code/valid/pack/transpose passes; the chunk decode pipeline is
    host-CPU-bound on a 4-core bench host). Threads split disjoint row
    ranges (the C loop releases the GIL). None when unavailable."""
    L = lib()
    if L is None or batch.shape[1] % 4:
        return None
    batch = np.ascontiguousarray(batch, dtype=np.uint8)
    B, W = batch.shape
    out = np.empty((W // 4, B), dtype=np.uint8)
    cnt = np.empty(B, dtype=np.int32)
    threads = max(1, min(threads, B // 4096 or 1))
    if threads == 1:
        r = L.km_pack2bit_t(batch.ctypes.data, B, W, out.ctypes.data,
                            cnt.ctypes.data, 0, B)
        return (out, cnt) if r >= 0 else None
    from concurrent.futures import ThreadPoolExecutor
    step = -(-B // threads)
    rngs = [(i, min(B, i + step)) for i in range(0, B, step)]
    with ThreadPoolExecutor(max_workers=threads) as ex:
        rs = list(ex.map(
            lambda ab: L.km_pack2bit_t(batch.ctypes.data, B, W,
                                       out.ctypes.data, cnt.ctypes.data,
                                       ab[0], ab[1]), rngs))
    return (out, cnt) if all(r >= 0 for r in rs) else None


def xxh64(data: bytes, seed: int = 0) -> int | None:
    L = lib()
    if L is None:
        return None
    return L.km_xxh64(data, len(data), seed)


def xxh64_batch(words: np.ndarray, seed: int = 0) -> np.ndarray | None:
    L = lib()
    if L is None:
        return None
    words = np.ascontiguousarray(words, dtype=np.uint64)
    w2 = np.atleast_2d(words)
    out = np.empty(w2.shape[0], dtype=np.uint64)
    L.km_xxh64_batch(w2.ctypes.data, w2.shape[0], w2.shape[1], seed,
                     out.ctypes.data)
    return out


def lz4_compress_block(data: bytes) -> bytes | None:
    L = lib()
    if L is None:
        return None
    cap = len(data) + len(data) // 128 + 64
    buf = ctypes.create_string_buffer(cap)
    n = L.km_lz4_compress_block(data, len(data), buf, cap)
    if n < 0:
        return None
    return buf.raw[:n]


def lz4_decompress_block(data: bytes, max_size: int) -> bytes | None:
    L = lib()
    if L is None:
        return None
    buf = ctypes.create_string_buffer(max_size)
    n = L.km_lz4_decompress_block(data, len(data), buf, max_size)
    if n < 0:
        return None    # corrupt OR output larger than max_size
    return buf.raw[:n]


def pack_superkmer(codes: np.ndarray, k: int) -> bytes | None:
    L = lib()
    if L is None:
        return None
    codes = np.ascontiguousarray(codes, dtype=np.uint8)
    total = len(codes)
    out = ctypes.create_string_buffer((total + 3) // 4 + 1)
    n = L.km_pack_superkmer(codes.ctypes.data, k, total, out)
    return out.raw[:n]


def parse_batch(data: bytes, fmt: str, pad: int = ord("N"),
                min_width: int = 0):
    """FASTA/FASTQ text -> ((n, L) uint8 batch padded with ``pad``,
    (n,) int32 lengths), entirely in C. Returns None when the native lib
    is unavailable."""
    L = lib()
    if L is None:
        return None
    fn = L.km_fasta_batch if fmt == "fasta" else L.km_fastq_batch
    mx = ctypes.c_int64(0)
    n = fn(data, len(data), None, 0, 0, None, ctypes.byref(mx))
    if n < 0:
        return None
    width = max(int(mx.value), min_width, 1)
    batch = np.full((max(n, 1), width), pad, dtype=np.uint8)
    lengths = np.zeros(max(n, 1), dtype=np.int32)
    if n:
        r = fn(data, len(data), batch.ctypes.data, n, width,
               lengths.ctypes.data, None)
        if r != n:
            return None
    return batch[:n], lengths[:n]


def lpt_distrib(bin_sizes: np.ndarray, nbpart: int) -> np.ndarray | None:
    """Repartitor::computeDistrib via the same libstdc++ std::sort /
    std::priority_queue — bit-identical tables to the reference binary on
    this platform (see kmtricks_native.cpp). None without the native lib."""
    L = lib()
    if L is None:
        return None
    bins = np.ascontiguousarray(bin_sizes, dtype=np.uint64)
    table = np.empty(len(bins), dtype=np.uint16)
    L.km_lpt_distrib(bins.ctypes.data, len(bins), nbpart, table.ctypes.data)
    return table


def parse_bam_batch(data: bytes, n_refs: int = 0,
                    excluded_mask: np.ndarray | None = None,
                    require_flags: int = 0, exclude_flags: int = 0,
                    pad: int = ord("N"), min_width: int = 0):
    """Inflated BAM alignment-record bytes (header already consumed) ->
    ((n, L) uint8 batch, (n,) int32 lengths, consumed_bytes), entirely in
    C (BankBam semantics: secondary/supplementary skipped, -f/-F flags,
    excluded references, 0x10 reads reverse-complemented back).
    ``consumed_bytes`` covers complete records only — streaming callers
    carry the remainder. Returns None when the native lib is unavailable
    or the records are malformed."""
    L = lib()
    if L is None:
        return None
    mask_ptr = None
    if excluded_mask is not None:
        excluded_mask = np.ascontiguousarray(excluded_mask, dtype=np.uint8)
        mask_ptr = excluded_mask.ctypes.data
        n_refs = len(excluded_mask)
    mx = ctypes.c_int64(0)
    consumed = ctypes.c_int64(0)
    n = L.km_bam_batch(data, len(data), n_refs, mask_ptr,
                       require_flags, exclude_flags, None, 0, 0, None,
                       ctypes.byref(mx), ctypes.byref(consumed))
    if n < 0:
        return None
    width = max(int(mx.value), min_width, 1)
    batch = np.full((max(n, 1), width), pad, dtype=np.uint8)
    lengths = np.zeros(max(n, 1), dtype=np.int32)
    if n:
        r = L.km_bam_batch(data, len(data), n_refs, mask_ptr,
                           require_flags, exclude_flags,
                           batch.ctypes.data, n, width,
                           lengths.ctypes.data, None, None)
        if r != n:
            return None
    return batch[:n], lengths[:n], int(consumed.value)


def unpack_superkmer(data: bytes, k: int, nbk: int) -> np.ndarray | None:
    L = lib()
    if L is None:
        return None
    total = k + nbk - 1
    out = np.empty(total, dtype=np.uint8)
    L.km_unpack_superkmer(data, k, nbk, out.ctypes.data)
    return out


def bf_fill(counts: np.ndarray, hashes: np.ndarray, rows: np.ndarray,
            threads: int = 1):
    """Presence bits of ``counts`` (n, nsamp) u8/bool scattered into the
    dense window ``rows`` (window, nb) at row indices ``hashes`` (n,)
    i64, LSB-first per byte (BITSET order, utils.hpp:52-55) — the fused
    native write_as_bf fill. Returns True on success, None when the
    native library is unavailable (callers fall back to numpy)."""
    L = lib()
    if L is None:
        return None
    counts = np.ascontiguousarray(counts, dtype=np.uint8)
    hashes = np.ascontiguousarray(hashes, dtype=np.int64)
    n, nsamp = counts.shape
    nb = rows.shape[1]
    threads = max(1, min(threads, n // (1 << 16) or 1))
    if threads == 1:
        r = L.km_bf_fill(counts.ctypes.data, hashes.ctypes.data, n, nsamp,
                         rows.ctypes.data, nb, 0, n)
        return True if r >= 0 else None
    from concurrent.futures import ThreadPoolExecutor
    step = -(-n // threads)
    rngs = [(i, min(n, i + step)) for i in range(0, n, step)]
    with ThreadPoolExecutor(max_workers=threads) as ex:
        rs = list(ex.map(
            lambda ab: L.km_bf_fill(counts.ctypes.data, hashes.ctypes.data,
                                    n, nsamp, rows.ctypes.data, nb,
                                    ab[0], ab[1]), rngs))
    return True if all(r >= 0 for r in rs) else None
