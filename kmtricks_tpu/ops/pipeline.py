"""Single-chip device pipeline driver: reads -> per-partition count tables.

Host code pads reads into fixed-shape batches, runs the jitted encode+count
kernels, and compacts the masked results into numpy per-partition tables
identical to the host golden path (and therefore to the reference).

Shapes are bucketed (lengths and window counts round up to multiples of
BUCKET) so recompilation is bounded: distinct (L, N) buckets, not distinct
inputs, trigger compiles.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from kmtricks_tpu.host.ops import SampleCounts
from kmtricks_tpu.ops import u64 as U
from kmtricks_tpu.ops.count import count_hashes, count_kmers
from kmtricks_tpu.ops.encode import encode_batch

BUCKET = 128


def _round_up(n: int, m: int = BUCKET) -> int:
    return ((n + m - 1) // m) * m


def pad_reads(sequences: list[bytes], k: int) -> tuple[np.ndarray, np.ndarray]:
    """Pack reads into a (B, L) uint8 batch + (B,) lengths.

    Reads shorter than k are dropped (they produce no windows); L is the
    max length rounded up to the bucket size. Padding byte is 'N' (invalid)
    so padded windows are masked out by validity alone.
    """
    seqs = [s for s in sequences if len(s) >= k]
    if not seqs:
        return np.zeros((0, k), dtype=np.uint8), np.zeros(0, dtype=np.int32)
    L = _round_up(max(len(s) for s in seqs))
    batch = np.full((len(seqs), L), ord("N"), dtype=np.uint8)
    lengths = np.zeros(len(seqs), dtype=np.int32)
    for i, s in enumerate(seqs):
        batch[i, :len(s)] = np.frombuffer(s, dtype=np.uint8)
        lengths[i] = len(s)
    return batch, lengths


def count_sample_device(
    sequences: list[bytes],
    k: int,
    m: int,
    repart_table: np.ndarray,
    hard_min: int = 1,
    mode: str = "kmer",
    window_bits: int | None = None,
    count_max: int = 0xFFFFFFFF,
    hist=None,
) -> SampleCounts:
    """Device-path equivalent of host.ops.count_sequences (k <= 32)."""
    assert k <= 32, "device path supports k <= 32; use the host path beyond"
    nb_parts = int(repart_table.max()) + 1 if len(repart_table) else 1
    table_dev = jnp.asarray(repart_table.astype(np.int32))

    batch, lengths = pad_reads(sequences, k)
    out = SampleCounts(kmer_size=k, nb_partitions=nb_parts)
    if batch.shape[0] == 0:
        return out

    hi, lo, parts, valid = encode_batch(
        jnp.asarray(batch), jnp.asarray(lengths), table_dev, k, m)
    hi, lo = hi.ravel(), lo.ravel()
    parts, valid = parts.ravel(), valid.ravel()

    if mode == "kmer":
        hi_s, lo_s, parts_s, head, counts = count_kmers(hi, lo, parts, valid)
        hi_s, lo_s = np.asarray(hi_s), np.asarray(lo_s)
        parts_s = np.asarray(parts_s)
        head, counts = np.asarray(head), np.asarray(counts)
        keys = U.to_u64_np(hi_s[head], lo_s[head]).reshape(-1, 1)
        kparts = parts_s[head]
        cnt = counts[head]
    else:
        assert window_bits is not None
        hh, hl, head, counts = count_hashes(hi, lo, parts, valid, window_bits)
        head, counts = np.asarray(head), np.asarray(counts)
        keys = U.to_u64_np(np.asarray(hh)[head], np.asarray(hl)[head])
        kparts = (keys // np.uint64(window_bits)).astype(np.int64)
        keys = keys.reshape(-1, 1)
        cnt = counts[head]

    if hist is not None:
        # per-partition tallies; reference histograms are per sample
        hist.inc_counts(cnt)
    cnt = cnt.astype(np.uint64)
    solid = cnt >= hard_min
    keys, kparts = keys[solid], kparts[solid]
    cnt = np.minimum(cnt[solid], np.uint64(count_max)).astype(np.uint32)
    out.n_kmers_total = int(head.sum())

    for p in range(nb_parts):
        sel = kparts == p
        pk = keys[sel]
        out.partitions[p] = (pk if mode == "kmer" else pk.ravel(), cnt[sel])
    return out
