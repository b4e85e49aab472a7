"""StreamCounter (bounded-RSS host counting) == count_sequences."""

import numpy as np
import pytest

from kmtricks_tpu.core.repartition import Repartition
from kmtricks_tpu.host.ops import StreamCounter, count_sequences

K, M, NB = 31, 10, 8


def make_reads(rng, n, lmin=40, lmax=200, with_n=True):
    reads = []
    G = 20000
    genome = rng.choice(np.frombuffer(b"ACGT", dtype=np.uint8), size=G)
    for _ in range(n):
        ln = int(rng.integers(lmin, lmax))
        s = int(rng.integers(0, G - ln))
        r = genome[s:s + ln].copy()
        if with_n and rng.random() < 0.3:
            r[rng.integers(0, ln)] = ord("N")
        reads.append(bytes(r))
    return reads


def batches_of(reads, rows=64):
    for i in range(0, len(reads), rows):
        blk = reads[i:i + rows]
        L = max(len(r) for r in blk)
        b = np.full((len(blk), L), ord("N"), np.uint8)
        ln = np.zeros(len(blk), np.int32)
        for j, r in enumerate(blk):
            b[j, :len(r)] = np.frombuffer(r, np.uint8)
            ln[j] = len(r)
        yield b, ln


@pytest.mark.parametrize("mode,budget", [
    ("kmer", 10**9),       # no collapse until finish
    ("kmer", 500),         # constant collapsing
    ("hash", 500),
])
def test_stream_counter_matches_count_sequences(mode, budget):
    rng = np.random.default_rng(11)
    reads = make_reads(rng, 500)
    repart = Repartition.from_xxh(NB, M)
    wb = 250048 if mode == "hash" else None
    ref = count_sequences(reads, K, M, repart.table, hard_min=2, mode=mode,
                          window_bits=wb, count_max=255)
    stc = StreamCounter(K, M, repart.table, mode=mode, window_bits=wb,
                        budget_entries=budget)
    for b, ln in batches_of(reads):
        stc.add_batch(b, ln)
    got = stc.finish(2, 255)
    assert got.n_kmers_total == ref.n_kmers_total
    for p in range(NB):
        rk, rc = ref.partitions.get(p, (None, None))
        gk, gc = got.partitions.get(p, (None, None))
        if rk is None:
            assert gk is None or len(gk) == 0
            continue
        np.testing.assert_array_equal(np.asarray(gk), np.asarray(rk))
        np.testing.assert_array_equal(gc, rc)


def test_stream_counter_histogram_matches():
    from kmtricks_tpu.core.histogram import KHist
    rng = np.random.default_rng(5)
    reads = make_reads(rng, 300)
    repart = Repartition.from_xxh(NB, M)
    h_ref, h_got = KHist(0, K), KHist(0, K)
    count_sequences(reads, K, M, repart.table, hard_min=1, hist=h_ref)
    stc = StreamCounter(K, M, repart.table, budget_entries=100)
    for b, ln in batches_of(reads, rows=17):
        stc.add_batch(b, ln)
    stc.finish(1, 0xFFFFFFFF, hist=h_got)
    assert h_got.uniq == h_ref.uniq and h_got.total == h_ref.total
    np.testing.assert_array_equal(h_got.hist_u, h_ref.hist_u)
    np.testing.assert_array_equal(h_got.hist_n, h_ref.hist_n)


def test_stream_counter_rss_bounded():
    """RSS growth while streaming a repetitive 160MB-equivalent sample
    stays far below the occurrence-array size (the old path held every
    occurrence: ~8 bytes per window)."""
    import resource

    rng = np.random.default_rng(3)
    G = 100_000
    genome = rng.choice(np.frombuffer(b"ACGT", dtype=np.uint8), size=G)
    repart = Repartition.from_xxh(NB, M)
    stc = StreamCounter(K, M, repart.table, budget_entries=300_000)
    rss0 = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
    rows, L = 512, 512
    nblocks = 60                         # ~15.7M bases streamed
    for _ in range(nblocks):
        starts = rng.integers(0, G - L, rows)
        b = genome[starts[:, None] + np.arange(L)]
        stc.add_batch(b, np.full(rows, L, np.int32))
    sc = stc.finish(1, 255)
    rss1 = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
    grew_mb = (rss1 - rss0) / 1024
    n_windows = nblocks * rows * (L - K + 1)
    occ_mb = n_windows * 8 / 1e6
    # the whole-sample occurrence array would be ~118MB; bounded
    # streaming should stay well under half that
    assert grew_mb < occ_mb / 2, (grew_mb, occ_mb)
    assert sc.n_kmers_total > 0
