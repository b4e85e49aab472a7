"""Sharded pipeline parity: 8-device CPU mesh vs host golden ops."""

import numpy as np
import jax.numpy as jnp
import pytest

import jax

from kmtricks_tpu.core.repartition import Repartition
from kmtricks_tpu.host.ops import count_sequences, merge_partition
from kmtricks_tpu.ops import u64 as U
from kmtricks_tpu.parallel.pipeline import (
    build_sharded_pipeline,
    build_single_chip_step,
    make_mesh,
    partition_to_device,
)

K, M = 31, 10
NB_PARTS = 8
WINDOW = 250048


def random_reads(rng, n, lo=60, hi=150, with_n=False):
    out = []
    alpha = b"ACGTN" if with_n else b"ACGT"
    p = [0.24, 0.24, 0.24, 0.24, 0.04] if with_n else None
    for _ in range(n):
        L = int(rng.integers(lo, hi))
        out.append(bytes(rng.choice(np.frombuffer(alpha, dtype=np.uint8),
                                    size=L, p=p)))
    return out


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(7)
    repart = Repartition.from_xxh(NB_PARTS, M)
    samples = [random_reads(rng, 24, with_n=True) for _ in range(3)]
    return repart, samples


def _golden_merged(repart, samples, mode, hard_min, amin_vec, rmin, save_if):
    """Host golden: per-sample count -> per-partition merge."""
    scs = [count_sequences(s, K, M, repart.table, hard_min=hard_min,
                           mode=mode, window_bits=WINDOW) for s in samples]
    rows = {}
    for p in range(NB_PARTS):
        keys_list, counts_list = [], []
        for sc in scs:
            kk, cc = sc.partitions.get(
                p, (np.zeros((0, 1), dtype=np.uint64),
                    np.zeros(0, dtype=np.uint32)))
            keys_list.append(kk)
            counts_list.append(cc)
        rows[p] = merge_partition(keys_list, counts_list, amin_vec,
                                  rmin, save_if)
    return rows


def _pad_global(samples, ndev):
    allseqs, samp = [], []
    for i, seqs in enumerate(samples):
        allseqs += seqs
        samp += [i] * len(seqs)
    L = max(len(s) for s in allseqs)
    L = ((L + 127) // 128) * 128
    B = ((len(allseqs) + ndev - 1) // ndev) * ndev
    batch = np.full((B, L), ord("N"), dtype=np.uint8)
    lengths = np.zeros(B, dtype=np.int32)
    sarr = np.zeros(B, dtype=np.int32)
    for i, s in enumerate(allseqs):
        batch[i, :len(s)] = np.frombuffer(s, dtype=np.uint8)
        lengths[i] = len(s)
        sarr[i] = samp[i]
    return batch, lengths, sarr


def _collect_device_rows(out, mode):
    (part_s, keys_s, samp_s, final, _cnt, present, key_head, row_keep,
     stats, dropped) = out
    part_s, samp_s, final, present, key_head, row_keep, stats = map(
        np.asarray, (part_s, samp_s, final, present, key_head, row_keep,
                     stats))
    assert int(np.asarray(dropped)) == 0
    keys = U.to_u64_np(np.asarray(keys_s[0]), np.asarray(keys_s[1]))
    return part_s, keys, samp_s, final, present, key_head, row_keep, stats


@pytest.mark.parametrize("mode", ["kmer", "hash"])
@pytest.mark.parametrize("hard_min,amin,rmin,save_if", [
    (1, 1, 1, 0),
    (2, 3, 2, 2),
])
def test_sharded_matches_golden(setup, mode, hard_min, amin, rmin, save_if):
    repart, samples = setup
    nsamp = len(samples)
    amin_vec = np.full(nsamp, amin, dtype=np.uint32)
    golden = _golden_merged(repart, samples, mode, hard_min, amin_vec,
                            rmin, save_if)

    mesh = make_mesh()
    ndev = mesh.shape["d"]
    batch, lengths, sarr = _pad_global(samples, ndev)
    n_windows = batch.shape[0] * (batch.shape[1] - K + 1)
    step = build_sharded_pipeline(
        mesh, k=K, m=M, nb_parts=NB_PARTS, cap=n_windows // ndev,
        nsamp=nsamp, hard_min=hard_min, rmin=rmin, save_if=save_if,
        mode=mode, window_bits=WINDOW)
    out = step(jnp.asarray(batch), jnp.asarray(lengths), jnp.asarray(sarr),
               jnp.asarray(repart.table.astype(np.int32)),
               jnp.asarray(amin_vec))
    part_s, keys, samp_s, final, present, key_head, row_keep, stats = (
        _collect_device_rows(out, mode))

    p2d = partition_to_device(NB_PARTS, ndev)
    # reconstruct per-partition merged matrices from the sharded output
    for p in range(NB_PARTS):
        g = golden[p]
        sel = (part_s == p) & key_head
        exp_keys = np.asarray(g.keys).reshape(len(g.keys), -1)[:, 0] \
            if len(g.keys) else np.zeros(0, dtype=np.uint64)
        got_keys = keys[sel]
        assert (got_keys == exp_keys).all(), f"partition {p} key mismatch"
        assert (row_keep[sel] == g.keep).all()
        # counts: scatter present entries into rows
        psel = (part_s == p) & present
        row_idx = np.cumsum(key_head[part_s == p]) - 1
        mat = np.zeros((len(exp_keys), nsamp), dtype=np.uint32)
        pm = present[part_s == p]
        mat[row_idx[pm], samp_s[part_s == p][pm]] = final[part_s == p][pm]
        assert (mat == g.counts).all(), f"partition {p} counts mismatch"
        # partition rows live on the owning device's shard
        if len(got_keys):
            n_local = len(part_s) // ndev
            dev_of_rows = np.flatnonzero(sel) // n_local
            assert (dev_of_rows == p2d[p]).all()

    # stats: sum of golden per-partition stats == psum'd device stats
    for i, name in enumerate(["non_solid", "rescued", "uniq_wo_rescue",
                              "uniq_w_rescue", "total_wo_rescue",
                              "total_w_rescue"]):
        exp = sum(getattr(golden[p].stats, name).astype(np.uint64)
                  for p in range(NB_PARTS))
        assert (stats[i].astype(np.uint64) == exp).all(), name


def test_single_chip_step_matches_golden(setup):
    repart, samples = setup
    nsamp = len(samples)
    amin_vec = np.full(nsamp, 2, dtype=np.uint32)
    golden = _golden_merged(repart, samples, "hash", 1, amin_vec, 1, 2)

    batch, lengths, sarr = _pad_global(samples, 1)
    step = build_single_chip_step(k=K, m=M, nsamp=nsamp, hard_min=1, rmin=1,
                                  save_if=2, mode="hash", window_bits=WINDOW)
    out = step(jnp.asarray(batch), jnp.asarray(lengths), jnp.asarray(sarr),
               jnp.asarray(repart.table.astype(np.int32)),
               jnp.asarray(amin_vec))
    (part_s, keys_s, samp_s, final, _cnt, present, key_head, row_keep,
     _row_of, stats) = out
    part_s, samp_s, final, present, key_head, row_keep = map(
        np.asarray, (part_s, samp_s, final, present, key_head, row_keep))
    keys = U.to_u64_np(np.asarray(keys_s[0]), np.asarray(keys_s[1]))

    all_exp = np.concatenate([np.asarray(golden[p].keys).ravel()
                              for p in range(NB_PARTS)])
    got = keys[key_head.astype(bool)]
    assert (got == all_exp).all()
    exp_keep = np.concatenate([golden[p].keep for p in range(NB_PARTS)])
    assert (row_keep[key_head.astype(bool)] == exp_keep).all()


def test_graft_entry_and_dryrun():
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out)
    ge.dryrun_multichip(8)
