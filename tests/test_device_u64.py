"""Device uint32-pair uint64 emulation + XXH64 vs numpy goldens."""

import random

import numpy as np
import pytest

from kmtricks_tpu.core.hashers import window_hash as np_window_hash
from kmtricks_tpu.core.hashers import xxh64_words
from kmtricks_tpu.ops import u64 as U
from kmtricks_tpu.ops.xxh64 import window_hash, xxh64

random.seed(3)
np.seterr(over="ignore")

N = 512


@pytest.fixture(scope="module")
def ab():
    a = np.frombuffer(random.randbytes(8 * N), dtype=np.uint64)
    b = np.frombuffer(random.randbytes(8 * N), dtype=np.uint64)
    return a, b


def got64(pair):
    return U.to_u64_np(np.asarray(pair[0]), np.asarray(pair[1]))


def test_add_sub_mul(ab):
    a, b = ab
    ah, bh = U.from_u64_np(a), U.from_u64_np(b)
    assert (got64(U.add64(ah, bh)) == a + b).all()
    assert (got64(U.sub64(ah, bh)) == a - b).all()
    assert (got64(U.mul64(ah, bh)) == a * b).all()
    hi = np.array([(int(x) * int(y)) >> 64 for x, y in zip(a, b)],
                  dtype=np.uint64)
    assert (got64(U.mulhi64(ah, bh)) == hi).all()


@pytest.mark.parametrize("s", [0, 1, 13, 31, 32, 33, 63])
def test_shifts(ab, s):
    a, _ = ab
    ah = U.from_u64_np(a)
    assert (got64(U.shl64(ah, s)) == a << np.uint64(s)).all()
    assert (got64(U.shr64(ah, s)) == a >> np.uint64(s)).all()
    exp_rot = a if s == 0 else (a << np.uint64(s)) | (a >> np.uint64(64 - s))
    assert (got64(U.rotl64(ah, s)) == exp_rot).all()


def test_dynamic_shifts(ab):
    a, _ = ab
    ah = U.from_u64_np(a)
    s2 = np.random.randint(0, 32, N).astype(np.uint32)
    assert (got64(U.shl64_dyn2(ah, s2)) == a << (2 * s2).astype(np.uint64)).all()
    assert (got64(U.shr64_dyn2(ah, s2)) == a >> (2 * s2).astype(np.uint64)).all()


@pytest.mark.parametrize("w", [3, 250048, 25_000_000, 2**31 - 1,
                               2**40 + 123, 2**62 + 7])
def test_mod_const(ab, w):
    a, _ = ab
    ah = U.from_u64_np(a)
    assert (got64(U.mod_const(ah, w)) == a % np.uint64(w)).all()


def test_compare(ab):
    a, b = ab
    ah, bh = U.from_u64_np(a), U.from_u64_np(b)
    assert (np.asarray(U.lt64(ah, bh)) == (a < b)).all()
    assert (got64(U.min64(ah, bh)) == np.minimum(a, b)).all()


@pytest.mark.parametrize("slots", [1, 2, 3, 4])
def test_device_xxh64(slots):
    arr = np.frombuffer(random.randbytes(8 * slots * N), dtype=np.uint64)
    arr = arr.reshape(N, slots)
    words = [U.from_u64_np(arr[:, i]) for i in range(slots)]
    got = got64(xxh64(words))
    assert (got == xxh64_words(arr)).all()


def test_device_window_hash():
    arr = np.frombuffer(random.randbytes(8 * N), dtype=np.uint64).reshape(N, 1)
    parts = np.random.randint(0, 64, N).astype(np.uint32)
    got = got64(window_hash([U.from_u64_np(arr[:, 0])], parts, 250048))
    assert (got == np_window_hash(arr, parts, 250048)).all()
