"""Hashing bit-exactness (mirrors reference tests/kmer_hash_test.cpp)."""

import random

import numpy as np
import pytest
import xxhash

from kmtricks_tpu.core.hashers import (
    HashWindow, bloom_fp, window_hash, xxh64_u32, xxh64_words,
)

random.seed(7)


@pytest.mark.parametrize("slots", [1, 2, 3, 4, 5, 8])
def test_xxh64_words_vs_xxhash(slots):
    arr = np.frombuffer(random.randbytes(8 * slots * 200), dtype=np.uint64)
    arr = arr.reshape(200, slots)
    got = xxh64_words(arr)
    exp = np.array([xxhash.xxh64(arr[i].tobytes()).intdigest()
                    for i in range(200)], dtype=np.uint64)
    assert (got == exp).all()


def test_xxh64_words_seed():
    arr = np.arange(10, dtype=np.uint64).reshape(10, 1)
    got = xxh64_words(arr, seed=123)
    exp = np.array([xxhash.xxh64(arr[i].tobytes(), seed=123).intdigest()
                    for i in range(10)], dtype=np.uint64)
    assert (got == exp).all()


def test_xxh64_u32():
    vals = np.arange(0, 100000, 37, dtype=np.uint32)
    got = xxh64_u32(vals)
    exp = np.array([xxhash.xxh64(int(v).to_bytes(4, "little")).intdigest()
                    for v in vals], dtype=np.uint64)
    assert (got == exp).all()


def test_hash_window_math(tmp_path):
    # hash.hpp:31-40: window = ROUND_UP(ceil(bloom/parts), 64)
    hw = HashWindow(1_000_000, 4, 10)
    assert hw.window_size_bits == 250048
    assert hw.bloom_size == 250048 * 4
    assert hw.lower(2) == 2 * 250048
    assert hw.upper(2) == 3 * 250048 - 1
    p = tmp_path / "hash.info"
    hw.serialize(str(p))
    assert p.stat().st_size == 36
    hw2 = HashWindow.load(str(p))
    assert hw2.window_size_bits == hw.window_size_bits
    assert hw2.bloom_size == hw.bloom_size
    assert hw2.minim_size == 10


def test_window_hash():
    kmers = np.arange(50, dtype=np.uint64).reshape(50, 1)
    parts = np.arange(50, dtype=np.uint32) % 4
    w = 250048
    h = window_hash(kmers, parts, w)
    assert ((h // w) == parts).all()
    base = xxh64_words(kmers)
    assert (h % np.uint64(w) == base % np.uint64(w)).all()


def test_bloom_fp():
    assert abs(bloom_fp(1000, 100) - (1.0 - np.exp(-0.1))) < 1e-12
