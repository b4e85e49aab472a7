"""Pallas u32 sort (tile bitonic + merge-path levels) vs np.sort.

Interpret mode on CPU; the TPU path compiles the same kernels."""

import os

import numpy as np
import pytest

from kmtricks_tpu.ops.pallas_sort import TILE, sort_u32


pytestmark = pytest.mark.skipif(
    not os.environ.get("KMTRICKS_TEST_EXPERIMENTS"),
    reason="retired experiment kernel (NOTES.md); set KMTRICKS_TEST_EXPERIMENTS=1")

@pytest.mark.parametrize("n", [100, TILE, 2 * TILE, 4 * TILE,
                               8 * TILE - 1000, 16 * TILE])
def test_sort_random(n):
    rng = np.random.default_rng(n)
    x = rng.integers(0, 2**32, n, dtype=np.uint64).astype(np.uint32)
    got = np.asarray(sort_u32(x, interpret=True))
    np.testing.assert_array_equal(got, np.sort(x))


def test_sort_skewed_and_duplicates():
    rng = np.random.default_rng(1)
    n = 4 * TILE
    x = rng.choice(np.array([0, 1, 5, 2**31, 2**31 + 1, 0xFFFFFFFF],
                            dtype=np.uint32), size=n)
    got = np.asarray(sort_u32(x, interpret=True))
    np.testing.assert_array_equal(got, np.sort(x))


def test_sort_presorted_and_reverse():
    n = 2 * TILE
    x = np.arange(n, dtype=np.uint32)
    np.testing.assert_array_equal(np.asarray(sort_u32(x, interpret=True)), x)
    r = x[::-1].copy()
    np.testing.assert_array_equal(np.asarray(sort_u32(r, interpret=True)), x)
