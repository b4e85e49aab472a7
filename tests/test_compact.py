"""Device-side row compaction (ops/compact.py) == the full-fetch path.

The compacted outputs (dense matrix, key rows, keep verdicts, per-partition
row counts and statistics) must reproduce exactly what the host used to
assemble from the N-sized kernel arrays (the reference emits the same
compact rows from its merge loop, merge.hpp:262-316)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from kmtricks_tpu.core.repartition import Repartition
from kmtricks_tpu.ops.compact import fetch_matrix, fetch_rows
from kmtricks_tpu.parallel.pipeline import (build_sharded_pipeline,
                                            build_single_chip_step,
                                            make_mesh)

K, M, NB_PARTS, NSAMP = 31, 10, 16, 4
B, L = 256, 192


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(1)
    G = B * L // 8
    genome = rng.choice(np.frombuffer(b"ACGT", dtype=np.uint8), size=G)
    starts = rng.integers(0, G - L, B)
    b = genome[starts[:, None] + np.arange(L)]
    samp = (np.arange(B, dtype=np.int32) * NSAMP) // B
    repart = Repartition.from_xxh(NB_PARTS, M)
    amin = np.full(NSAMP, 2, np.uint32)
    return (jnp.asarray(np.ascontiguousarray(b.T)),
            jnp.asarray(np.full(B, L, np.int32)), jnp.asarray(samp),
            jnp.asarray(repart.table.astype(np.int32)), jnp.asarray(amin))


@pytest.fixture(scope="module")
def reference(data):
    """Host-assembled rows from the full (non-compacted) kernel output."""
    step = jax.jit(build_single_chip_step(
        k=K, m=M, nsamp=NSAMP, hard_min=1, rmin=1, save_if=2, mode="kmer",
        static_repart_parts=NB_PARTS, with_stats=True, batch_layout="lb"))
    (part_s, keys_s, samp_s, final, cnt, present, row_head, row_keep,
     _row_of, stats) = step(*data)
    part_s, samp_s, final = map(np.asarray, (part_s, samp_s, final))
    present = np.asarray(present).astype(bool)
    row_head = np.asarray(row_head).astype(bool)
    row_keep = np.asarray(row_keep).astype(bool)
    keys0, keys1 = np.asarray(keys_s[0]), np.asarray(keys_s[1])
    row_of = np.cumsum(row_head) - 1
    nrows = int(row_of[-1]) + 1 if row_head.any() else 0
    mat = np.zeros((nrows, NSAMP), np.uint32)
    mat[row_of[present], samp_s[present]] = final[present]
    return dict(nrows=nrows, mat=mat, k0=keys0[row_head],
                k1=keys1[row_head], keep=row_keep[row_head],
                part=part_s[row_head], stats=np.asarray(stats))


def test_single_chip_compact(data, reference):
    ref = reference
    rows_cap = 1 << int(np.ceil(np.log2(max(ref["nrows"], 2))))
    step = jax.jit(build_single_chip_step(
        k=K, m=M, nsamp=NSAMP, hard_min=1, rmin=1, save_if=2, mode="kmer",
        static_repart_parts=NB_PARTS, with_stats=True, batch_layout="lb",
        compact_rows=rows_cap))
    ku, mat, keep, part_rows, stats_pp, nrows, maxc = step(*data)
    nr, maxv = int(nrows), int(maxc)
    assert nr == ref["nrows"]
    ku_h = fetch_rows(ku, nr, tile=4096)
    mat_h = fetch_matrix(mat, nr, maxv, tile=4096)
    keep_h = fetch_rows(keep, nr, tile=4096)
    pr = np.asarray(part_rows)
    assert (mat_h == ref["mat"]).all()
    assert (ku_h[:, 0] == ref["k0"]).all()
    assert (ku_h[:, 1] == ref["k1"]).all()
    assert (keep_h == ref["keep"]).all()
    assert (np.repeat(np.arange(NB_PARTS), pr) == ref["part"]).all()
    # per-partition stats sum to the kernel's global stats
    assert (np.asarray(stats_pp).sum(axis=1) == ref["stats"]).all()
    assert maxv == int(ref["mat"].max())


def test_single_chip_compact_overflow_reports_nrows(data, reference):
    """rows_cap smaller than nrows: scatters drop, nrows still exact so
    callers can re-run with a doubled cap."""
    step = jax.jit(build_single_chip_step(
        k=K, m=M, nsamp=NSAMP, hard_min=1, rmin=1, save_if=2, mode="kmer",
        static_repart_parts=NB_PARTS, with_stats=False, batch_layout="lb",
        compact_rows=128))
    out = step(*data)
    assert int(out[5]) == reference["nrows"]


def test_mesh_compact(data, reference):
    ref = reference
    rows_cap = 1 << int(np.ceil(np.log2(max(ref["nrows"], 2))))
    ndev = 4
    mesh = make_mesh(ndev)
    cap = B * (L - K + 1) // ndev
    step = build_sharded_pipeline(
        mesh, k=K, m=M, nb_parts=NB_PARTS, cap=cap, nsamp=NSAMP,
        hard_min=1, rmin=1, save_if=2, mode="kmer", static_repart=True,
        with_stats=True, batch_layout="lb", compact_rows=rows_cap)
    (ku, mat, keep, part_rows, stats_pp, nrows, maxc, dropped) = step(*data)
    assert int(np.asarray(dropped)) == 0
    nrs = np.asarray(nrows)
    assert nrs.sum() == ref["nrows"]
    blocks = [(fetch_rows(ku, int(nrs[d]), offset=d * rows_cap, tile=4096),
               fetch_matrix(mat, int(nrs[d]), int(maxc),
                            offset=d * rows_cap, tile=4096),
               fetch_rows(keep, int(nrs[d]), offset=d * rows_cap,
                          tile=4096))
              for d in range(ndev)]
    ku_g = np.concatenate([x[0] for x in blocks])
    mat_g = np.concatenate([x[1] for x in blocks])
    keep_g = np.concatenate([x[2] for x in blocks])
    assert (mat_g == ref["mat"]).all()
    assert (ku_g[:, 0] == ref["k0"]).all()
    assert (keep_g == ref["keep"]).all()
    assert (np.repeat(np.arange(NB_PARTS), np.asarray(part_rows))
            == ref["part"]).all()
    assert (np.asarray(stats_pp).sum(axis=1) == ref["stats"]).all()


def test_fetch_rows_tiling():
    """Tiled fetch == plain slice for awkward sizes/offsets."""
    rng = np.random.default_rng(3)
    a = jnp.asarray(rng.integers(0, 2**31, (1000, 3), dtype=np.int32))
    for off, n in ((0, 1000), (0, 999), (17, 700), (990, 10), (5, 1)):
        got = fetch_rows(a, n, tile=256, offset=off)
        np.testing.assert_array_equal(got, np.asarray(a)[off:off + n])
    assert fetch_rows(a, 0, tile=256).shape == (0, 3)
    got8 = fetch_rows(jnp.asarray(np.arange(100, dtype=np.uint32)), 77,
                      cast="u8", tile=64)
    np.testing.assert_array_equal(got8, np.arange(77, dtype=np.uint8))
