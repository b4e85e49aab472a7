"""Device-side row compaction (ops/compact.py) == the full-fetch path.

The compacted outputs (dense pre-merge count matrix + key/partition rows)
must reproduce exactly what the host used to assemble from the N-sized
kernel arrays, and host/ops.merge_dense must rebuild the same final
counts, keep verdicts and statistics the kernel computed (the reference
emits the same compact rows from its merge loop, merge.hpp:262-316)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from kmtricks_tpu.core.repartition import Repartition
from kmtricks_tpu.host.ops import merge_dense
from kmtricks_tpu.ops.compact import fetch_matrix, fetch_rows
from kmtricks_tpu.parallel.pipeline import (build_sharded_pipeline,
                                            build_single_chip_step,
                                            make_mesh)

K, M, NB_PARTS, NSAMP = 31, 10, 16, 4
B, L = 256, 192
RMIN, SAVE_IF = 2, 2


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
        k=K, m=M, nsamp=NSAMP, hard_min=1, rmin=RMIN, save_if=SAVE_IF,
        mode="kmer", static_repart_parts=NB_PARTS, with_stats=True,
        batch_layout="lb"))
    (part_s, keys_s, samp_s, final, cnt, present, row_head, row_keep,
     _row_of, stats) = step(*data)
    part_s, samp_s, final, cnt = map(np.asarray,
                                     (part_s, samp_s, final, cnt))
    present = np.asarray(present).astype(bool)
    row_head = np.asarray(row_head).astype(bool)
    row_keep = np.asarray(row_keep).astype(bool)
    keys0, keys1 = np.asarray(keys_s[0]), np.asarray(keys_s[1])
    row_of = np.cumsum(row_head) - 1
    nrows = int(row_of[-1]) + 1 if row_head.any() else 0
    pre = np.zeros((nrows, NSAMP), np.uint32)
    pre[row_of[present], samp_s[present]] = cnt[present]
    mat = np.zeros((nrows, NSAMP), np.uint32)
    mat[row_of[present], samp_s[present]] = final[present]
    return dict(nrows=nrows, pre=pre, mat=mat, k0=keys0[row_head],
                k1=keys1[row_head], keep=row_keep[row_head],
                part=part_s[row_head], stats=np.asarray(stats),
                maxc=int(cnt[present].max()) if present.any() else 0)


def check_block(ref, rows, pre, amin):
    assert (pre == ref["pre"]).all()
    assert (rows[:, 0] == ref["k0"]).all()
    assert (rows[:, 1] == ref["k1"]).all()
    assert (rows[:, 2] == ref["part"]).all()
    # merge semantics reconstructed from the dense pre matrix
    keys = (rows[:, 0].astype(np.uint64) << np.uint64(32)) | rows[:, 1]
    res = merge_dense(keys, pre, amin, RMIN, SAVE_IF)
    assert (res.counts == ref["mat"]).all()
    assert (res.keep == ref["keep"]).all()
    # stats equal the kernel's device-computed ones
    got = np.stack([res.stats.non_solid, res.stats.rescued,
                    res.stats.uniq_wo_rescue, res.stats.uniq_w_rescue,
                    res.stats.total_wo_rescue, res.stats.total_w_rescue])
    assert (got == ref["stats"]).all()


def test_single_chip_compact(data, reference):
    ref = reference
    rows_cap = 1 << int(np.ceil(np.log2(max(ref["nrows"], 2))))
    step = jax.jit(build_single_chip_step(
        k=K, m=M, nsamp=NSAMP, hard_min=1, rmin=RMIN, save_if=SAVE_IF,
        mode="kmer", static_repart_parts=NB_PARTS, with_stats=False,
        batch_layout="lb", compact_rows=rows_cap))
    rows_d, pre_d, nrows, maxc, npres = step(*data)
    nr, maxv = int(nrows), int(maxc)
    assert nr == ref["nrows"] and maxv == ref["maxc"]
    rows = fetch_rows(rows_d, nr, tile=4096)
    pre = fetch_matrix(pre_d, nr, maxv, tile=4096)
    check_block(ref, rows, pre, np.full(NSAMP, 2, np.uint32))


def test_single_chip_compact_overflow_reports_nrows(data, reference):
    """rows_cap smaller than nrows: scatters drop, nrows still exact so
    callers can re-run with a doubled cap."""
    step = jax.jit(build_single_chip_step(
        k=K, m=M, nsamp=NSAMP, hard_min=1, rmin=RMIN, save_if=SAVE_IF,
        mode="kmer", static_repart_parts=NB_PARTS, with_stats=False,
        batch_layout="lb", compact_rows=128))
    out = step(*data)
    assert int(out[2]) == reference["nrows"]
    assert int(out[4]) == int((reference["pre"] > 0).sum())


def test_mesh_compact(data, reference):
    ref = reference
    rows_cap = 1 << int(np.ceil(np.log2(max(ref["nrows"], 2))))
    ndev = 4
    mesh = make_mesh(ndev)
    cap = B * (L - K + 1) // ndev
    step = build_sharded_pipeline(
        mesh, k=K, m=M, nb_parts=NB_PARTS, cap=cap, nsamp=NSAMP,
        hard_min=1, rmin=RMIN, save_if=SAVE_IF, mode="kmer",
        static_repart=True, with_stats=False, batch_layout="lb",
        compact_rows=rows_cap)
    rows_d, pre_d, nrows, maxc, npres, dropped = step(*data)
    assert int(np.asarray(dropped)) == 0
    nrs = np.asarray(nrows)
    assert nrs.sum() == ref["nrows"]
    assert int(maxc) == ref["maxc"]
    blocks = [(fetch_rows(rows_d, int(nrs[d]), offset=d * rows_cap,
                          tile=4096),
               fetch_matrix(pre_d, int(nrs[d]), int(maxc),
                            offset=d * rows_cap, tile=4096))
              for d in range(ndev)]
    rows = np.concatenate([x[0] for x in blocks])
    pre = np.concatenate([x[1] for x in blocks])
    check_block(ref, rows, pre, np.full(NSAMP, 2, np.uint32))


def test_hash_mode_compact_no_part_column(data):
    """Hash mode: no partition column (part = key // window_bits)."""
    window_bits = 250048
    nrows_probe = jax.jit(build_single_chip_step(
        k=K, m=M, nsamp=NSAMP, hard_min=1, rmin=1, save_if=0, mode="hash",
        window_bits=window_bits, static_repart_parts=NB_PARTS,
        with_stats=False, batch_layout="lb"))
    (part_s, keys_s, samp_s, _f, cnt, present, row_head, _rk, _ro,
     _st) = nrows_probe(*data)
    row_head_np = np.asarray(row_head).astype(bool)
    nrows = int(row_head_np.sum())
    rows_cap = 1 << int(np.ceil(np.log2(max(nrows, 2))))
    step = jax.jit(build_single_chip_step(
        k=K, m=M, nsamp=NSAMP, hard_min=1, rmin=1, save_if=0, mode="hash",
        window_bits=window_bits, static_repart_parts=NB_PARTS,
        with_stats=False, batch_layout="lb", compact_rows=rows_cap))
    rows_d, pre_d, nrows_d, maxc, npres = step(*data)
    assert int(nrows_d) == nrows
    rows = fetch_rows(rows_d, nrows, tile=4096)
    assert rows.shape[1] == 2      # two hash words, no part column
    k0 = np.asarray(keys_s[0])[row_head_np]
    k1 = np.asarray(keys_s[1])[row_head_np]
    assert (rows[:, 0] == k0).all() and (rows[:, 1] == k1).all()
    hashes = (rows[:, 0].astype(np.uint64) << np.uint64(32)) | rows[:, 1]
    parts = (hashes // np.uint64(window_bits)).astype(np.int64)
    assert (parts == np.asarray(part_s)[row_head_np]).all()


def test_fetch_rows_tiling():
    """Tiled fetch == plain slice for awkward sizes/offsets."""
    rng = np.random.default_rng(3)
    a = jnp.asarray(rng.integers(0, 2**31, (1000, 3), dtype=np.int32))
    for off, n in ((0, 1000), (0, 999), (17, 700), (990, 10), (5, 1)):
        got = fetch_rows(a, n, tile=256, offset=off)
        np.testing.assert_array_equal(got, np.asarray(a)[off:off + n])
    # adaptive tile path (tile=None)
    np.testing.assert_array_equal(fetch_rows(a, 999, offset=1),
                                  np.asarray(a)[1:1000])
    assert fetch_rows(a, 0, tile=256).shape == (0, 3)
    got8 = fetch_rows(jnp.asarray(np.arange(100, dtype=np.uint32)), 77,
                      cast="u8", tile=64)
    np.testing.assert_array_equal(got8, np.arange(77, dtype=np.uint8))
