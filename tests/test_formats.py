"""On-disk format roundtrips (mirrors reference tests/io/*_file_test.cpp)."""

import random

import numpy as np
import pytest

from kmtricks_tpu.io import formats as F
from kmtricks_tpu.io import lz4

random.seed(11)


def rand_u64(n, slots=1):
    a = np.frombuffer(random.randbytes(8 * n * slots), dtype=np.uint64)
    return a.reshape(n, slots)


@pytest.mark.parametrize("compressed", [False, True])
@pytest.mark.parametrize("k", [21, 31, 45, 64])
def test_kmer_file_roundtrip(tmp_path, k, compressed):
    n, slots = 1000, (k + 31) // 32
    kmers = rand_u64(n, slots)
    counts = np.random.randint(1, 255, n).astype(np.uint32)
    p = str(tmp_path / "t.kmer")
    F.write_kmer_file(p, kmers, counts, k, 4, 3, 7, compressed)
    info, k2, c2 = F.read_kmer_file(p)
    assert info.kmer_size == k and info.kmer_slots == slots
    assert info.count_slots == 4 and info.id == 3 and info.partition == 7
    assert (k2 == kmers).all() and (c2 == counts).all()
    assert F.get_km_file_type(p) == "kmer"


def test_hash_file_roundtrip(tmp_path):
    n = 10000  # spans multiple 4096-entry blocks
    hashes = np.sort(rand_u64(n).ravel())
    counts = np.random.randint(1, 255, n).astype(np.uint8)
    p = str(tmp_path / "t.hash")
    F.write_hash_file(p, hashes, counts, 1, 1, 2)
    info, h2, c2 = F.read_hash_file(p)
    assert info.count_slots == 1 and info.id == 1 and info.partition == 2
    assert (h2 == hashes).all() and (c2 == counts).all()
    assert F.get_km_file_type(p) == "hash"


@pytest.mark.parametrize("compressed", [False, True])
def test_matrix_file_roundtrip(tmp_path, compressed):
    n, k, nb = 500, 31, 5
    kmers = rand_u64(n)
    counts = np.random.randint(0, 1000, (n, nb)).astype(np.uint32)
    p = str(tmp_path / "t.count")
    F.write_matrix_file(p, kmers, counts, k, 4, 0, 1, compressed)
    info, k2, c2 = F.read_matrix_file(p, count_bytes=4)
    assert info.nb_counts == nb
    assert info.count_slots == 1  # reference write_as_bin quirk
    assert (k2 == kmers).all() and (c2 == counts).all()
    assert F.get_km_file_type(p) == "matrix"


def test_matrix_hash_file_roundtrip(tmp_path):
    n, nb = 500, 3
    hashes = rand_u64(n).ravel()
    counts = np.random.randint(0, 1000, (n, nb)).astype(np.uint32)
    p = str(tmp_path / "t.count_hash")
    F.write_matrix_hash_file(p, hashes, counts, 4, 0, 1)
    info, h2, c2 = F.read_matrix_hash_file(p)
    assert (h2 == hashes).all() and (c2 == counts).all()
    assert F.get_km_file_type(p) == "matrix_hash"


@pytest.mark.parametrize("compressed", [False, True])
def test_pa_matrix_roundtrip(tmp_path, compressed):
    n, k, bits = 300, 31, 13
    kmers = rand_u64(n)
    pa = np.random.randint(0, 2, (n, bits)).astype(bool)
    rows = F.pack_pa_bits(pa)
    p = str(tmp_path / "t.pa")
    F.write_pa_matrix_file(p, kmers, rows, k, bits, 0, 2, compressed)
    info, k2, r2 = F.read_pa_matrix_file(p)
    assert info.bits == bits and info.bytes == (bits + 7) // 8
    assert (k2 == kmers).all() and (r2 == rows).all()
    assert (F.unpack_pa_bits(r2, bits) == pa).all()
    assert F.get_km_file_type(p) == "pa_matrix"


def test_pa_hash_matrix_roundtrip(tmp_path):
    n, bits = 300, 9
    hashes = rand_u64(n).ravel()
    rows = F.pack_pa_bits(np.random.randint(0, 2, (n, bits)).astype(bool))
    p = str(tmp_path / "t.pa_hash")
    F.write_pa_hash_matrix_file(p, hashes, rows, bits, 0, 2)
    info, h2, r2 = F.read_pa_hash_matrix_file(p)
    assert (h2 == hashes).all() and (r2 == rows).all()
    assert F.get_km_file_type(p) == "pa_matrix_hash"


@pytest.mark.parametrize("compressed", [False, True])
def test_vector_matrix_roundtrip(tmp_path, compressed):
    bits, window = 10, 2048
    rows = np.random.randint(0, 256, (window, 2)).astype(np.uint8)
    p = str(tmp_path / "t.cmbf")
    F.write_vector_matrix_file(p, rows, bits, 0, 3, 6144, window, compressed)
    info, r2 = F.read_vector_matrix_file(p)
    assert info.bits == bits and info.first == 6144 and info.window == window
    assert info.partition == 3
    assert (r2 == rows).all()
    assert F.get_km_file_type(p) == "bit_matrix"
    if not compressed:
        # header is exactly 49 bytes (reference seeks to 49 + row offsets)
        import os
        assert os.path.getsize(p) == 49 + window * 2


def test_bit_vector_roundtrip(tmp_path):
    bits = 1000
    vec = np.random.randint(0, 256, (bits + 7) // 8).astype(np.uint8)
    p = str(tmp_path / "t.vector")
    F.write_bit_vector_file(p, vec, bits, 4, 5)
    (b2, sid, part), v2 = F.read_bit_vector_file(p)
    assert (b2, sid, part) == (bits, 4, 5)
    assert (v2 == vec).all()
    assert F.get_km_file_type(p) == "vector"


def test_lz4_frame_roundtrip():
    for data in (b"", b"x", b"hello" * 1000, random.randbytes(300000),
                 bytes(123457)):
        assert lz4.decompress(lz4.compress(data)) == data
