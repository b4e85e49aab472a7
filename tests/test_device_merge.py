"""Device merge parity vs host golden merge (incl. rescue) and fixtures."""

import random

import numpy as np
import pytest

from kmtricks_tpu.host.ops import merge_partition
from kmtricks_tpu.ops.merge import merge_partition_device

random.seed(5)


def rand_tables(nsamp, nmax=300):
    keys, cnts = [], []
    for _ in range(nsamp):
        n = random.randint(0, nmax)
        k = np.sort(np.random.choice(np.arange(1000, dtype=np.uint64),
                                     size=n, replace=False))
        c = np.random.randint(1, 20, n).astype(np.uint32)
        keys.append(k)
        cnts.append(c)
    return keys, cnts


def assert_merge_equal(a, b):
    assert a.keys.shape == b.keys.shape
    assert (np.asarray(a.keys) == np.asarray(b.keys)).all()
    assert (a.counts == b.counts).all()
    assert (a.keep == b.keep).all()
    for f in ("non_solid", "rescued", "uniq_wo_rescue", "uniq_w_rescue",
              "total_wo_rescue", "total_w_rescue"):
        assert (getattr(a.stats, f).astype(np.uint64)
                == getattr(b.stats, f).astype(np.uint64)).all(), f


@pytest.mark.parametrize("rmin,save_if", [(1, 0), (1, 1), (2, 0), (2, 1),
                                          (3, 2), (1, 3)])
def test_device_merge_vs_host(rmin, save_if):
    for _ in range(3):
        keys, cnts = rand_tables(4)
        amin = np.random.randint(1, 6, 4).astype(np.uint32)
        h = merge_partition(keys, cnts, amin, rmin, save_if)
        d = merge_partition_device(keys, cnts, amin, rmin, save_if)
        assert_merge_equal(d, h)


def test_device_merge_empty():
    keys = [np.zeros(0, dtype=np.uint64)] * 2
    cnts = [np.zeros(0, dtype=np.uint32)] * 2
    d = merge_partition_device(keys, cnts, np.array([1, 1], np.uint32), 1, 0)
    assert len(d.keys) == 0


def test_device_merge_golden_fixtures(reference_data):
    from kmtricks_tpu.io.formats import read_hash_file
    amin = np.array([1, 1], dtype=np.uint32)
    for p, expect in zip(range(4), (57, 67, 70, 82)):
        keys, cnts = [], []
        for s in ("D1", "D2"):
            _, h, c = read_hash_file(str(reference_data / "partitions" / "hashes"
                                         / f"partition_{p}" / f"{s}.hash"))
            keys.append(h)
            cnts.append(c.astype(np.uint32))
        d = merge_partition_device(keys, cnts, amin, 1, 1)
        assert len(d.keys) == expect
