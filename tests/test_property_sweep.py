"""Randomized property sweep: host golden vs device kernels across random
parameter combinations (k, m, thresholds, rescue, modes, per-sample amins).

Each case counts random N-containing reads per sample on both paths and
merges with random rescue parameters — results must agree exactly.
"""

import numpy as np
import pytest

from kmtricks_tpu.core.repartition import Repartition
from kmtricks_tpu.host.ops import count_sequences, merge_partition
from kmtricks_tpu.ops.merge import merge_partition_device
from kmtricks_tpu.ops.pipeline import count_sample_device

CASES = []
_rng = np.random.default_rng(123456)
for i in range(10):
    CASES.append(dict(
        seed=int(_rng.integers(1 << 30)),
        k=int(_rng.choice([15, 21, 27, 31, 32, 33, 41, 55, 64])),
        m=int(_rng.choice([6, 8, 10])),
        mode=str(_rng.choice(["kmer", "hash"])),
        nsamp=int(_rng.integers(2, 5)),
        nb_parts=int(_rng.choice([3, 4, 8])),
        hard_min=int(_rng.integers(1, 4)),
        rmin=int(_rng.integers(1, 3)),
        save_if=int(_rng.integers(0, 3)),
        window_bits=int(_rng.choice([250048, 64 * 1499])),
    ))


@pytest.mark.parametrize("case", CASES,
                         ids=[f"c{i}" for i in range(len(CASES))])
def test_host_device_parity_random(case):
    rng = np.random.default_rng(case["seed"])
    k, m, mode = case["k"], case["m"], case["mode"]
    rep = Repartition.from_xxh(case["nb_parts"], m)
    amin = rng.integers(1, 5, case["nsamp"]).astype(np.uint32)

    samples = []
    for _ in range(case["nsamp"]):
        reads = [bytes(rng.choice(np.frombuffer(b"ACGTN", np.uint8),
                                  size=int(rng.integers(k, k + 120)),
                                  p=[.24, .24, .24, .24, .04]))
                 for _ in range(int(rng.integers(5, 25)))]
        samples.append(reads)

    kw = dict(hard_min=case["hard_min"], mode=mode,
              window_bits=case["window_bits"])
    host = [count_sequences(s, k, m, rep.table, **kw) for s in samples]
    dev = [count_sample_device(s, k, m, rep.table, **kw) for s in samples]

    empty_k = (np.zeros((0, (k + 31) // 32), np.uint64) if mode == "kmer"
               else np.zeros(0, np.uint64))
    for p in range(case["nb_parts"]):
        hk, dk = [], []
        for h, d in zip(host, dev):
            a = h.partitions.get(p, (empty_k, np.zeros(0, np.uint32)))
            b = d.partitions.get(p, (empty_k, np.zeros(0, np.uint32)))
            assert np.asarray(a[0]).shape == np.asarray(b[0]).shape, (p, k)
            assert (np.asarray(a[0]) == np.asarray(b[0])).all(), (p, k)
            assert (np.asarray(a[1]) == np.asarray(b[1])).all(), (p, k)
            hk.append(a)
        keys_list = [x[0] for x in hk]
        counts_list = [x[1] for x in hk]
        g = merge_partition(keys_list, counts_list, amin,
                            case["rmin"], case["save_if"])
        r = merge_partition_device(keys_list, counts_list, amin,
                                   case["rmin"], case["save_if"])
        assert (np.asarray(r.keys) == np.asarray(g.keys)).all(), (p, k)
        assert (r.counts == g.counts).all(), (p, k)
        assert (r.keep == g.keep).all(), (p, k)
        for f in ("non_solid", "rescued", "uniq_wo_rescue",
                  "uniq_w_rescue", "total_wo_rescue", "total_w_rescue"):
            assert (getattr(r.stats, f) == getattr(g.stats, f)).all(), \
                (p, k, f)
