"""Roundtrip/property tests for the clean-room TurboPFor-style p4 codec
(io/p4.py) and the `.hash.p4` container (hash_file.hpp:100-131)."""

import numpy as np
import pytest

from kmtricks_tpu.io import p4
from kmtricks_tpu.io import formats as F


def _sorted_hashes(rng, n, hi=2**63):
    return np.unique(rng.integers(0, hi, size=n * 2, dtype=np.uint64))[:n]


@pytest.mark.parametrize("n", [0, 1, 2, 127, 128, 129, 4096, 10007])
def test_p4nd1_roundtrip(n):
    rng = np.random.default_rng(n + 1)
    vals = _sorted_hashes(rng, n)
    enc = p4.p4nd1enc64(vals)
    dec = p4.p4nd1dec64(enc, len(vals))
    np.testing.assert_array_equal(dec, vals)


def test_p4nd1_dense_and_sparse():
    # consecutive values -> deltas-1 are all zero -> near-empty blocks
    vals = np.arange(10_000, dtype=np.uint64) + np.uint64(5)
    enc = p4.p4nd1enc64(vals)
    assert len(enc) < 200  # 79 blocks, ~1 byte each + varint
    np.testing.assert_array_equal(p4.p4nd1dec64(enc, len(vals)), vals)
    # huge outliers force the exception path
    vals = np.cumsum(np.array([1, 1, 1, 2**62, 1, 1] * 40, dtype=np.uint64))
    enc = p4.p4nd1enc64(vals)
    np.testing.assert_array_equal(p4.p4nd1dec64(enc, len(vals)), vals)


@pytest.mark.parametrize("width", [1, 2, 4])
@pytest.mark.parametrize("n", [0, 1, 5, 128, 4096, 9999])
def test_p4nz_roundtrip(width, n):
    rng = np.random.default_rng(width * 31 + n)
    hi = 2 ** (8 * width) - 1
    vals = rng.integers(0, hi, size=n, dtype=np.uint64)
    enc = p4.p4nzenc(vals, width)
    dec = p4.p4nzdec(enc, n, width)
    np.testing.assert_array_equal(dec, vals.astype(dec.dtype))


def test_p4nz_skewed_counts_compress():
    # realistic counts: mostly 1-3 with rare large values
    rng = np.random.default_rng(7)
    vals = rng.choice([1, 1, 1, 2, 2, 3, 250], size=8192).astype(np.uint64)
    enc = p4.p4nzenc(vals, 4)
    assert len(enc) < 8192 * 4 // 4  # at least 4x smaller than raw u32
    np.testing.assert_array_equal(p4.p4nzdec(enc, len(vals), 4), vals)


def test_p4_exception_block_selection():
    # one value much larger than the rest inside a single block: the chosen
    # b must stay small, with the outlier carried as an exception
    vals = np.full(128, 3, dtype=np.uint64)
    vals[77] = 2**50
    out = bytearray()
    p4._block_enc(vals, out)
    assert out[0] & 0x80  # exception flag set
    assert (out[0] & 0x7F) <= 2
    dec, _ = p4._block_dec(bytes(out), 0, 128)
    np.testing.assert_array_equal(dec, vals)


@pytest.mark.parametrize("count_bytes", [1, 2, 4])
def test_hash_file_p4_roundtrip(tmp_path, count_bytes):
    rng = np.random.default_rng(42)
    n = 9000  # spans three 4096-blocks
    hashes = _sorted_hashes(rng, n)
    counts = rng.integers(1, 2 ** (8 * count_bytes) - 1, size=len(hashes),
                          dtype=np.uint64)
    path = str(tmp_path / "t.hash.p4")
    F.write_hash_file(path, hashes, counts, count_bytes, 3, 1,
                      compressed=True)
    info, h2, c2 = F.read_hash_file(path)
    assert info.compressed and info.id == 3 and info.partition == 1
    np.testing.assert_array_equal(h2, hashes)
    np.testing.assert_array_equal(c2, counts.astype(c2.dtype))
    # compressed should actually be smaller than the raw encoding
    raw = str(tmp_path / "t.hash")
    F.write_hash_file(raw, hashes, counts, count_bytes, 3, 1)
    import os
    assert os.path.getsize(path) < os.path.getsize(raw)


def test_hash_file_p4_empty(tmp_path):
    path = str(tmp_path / "e.hash.p4")
    F.write_hash_file(path, np.zeros(0, np.uint64), np.zeros(0, np.uint32),
                      4, 0, 0, compressed=True)
    _, h, c = F.read_hash_file(path)
    assert len(h) == 0 and len(c) == 0
