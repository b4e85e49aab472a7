"""Single-chip device pipeline driver: reads -> per-partition count tables.

Host code pads reads into fixed-shape batches, runs the jitted
encode+count kernels, and compacts the masked results into numpy
per-partition tables identical to the host golden path (and therefore to
the reference).

Shapes are bucketed (lengths round up to multiples of BUCKET) so
recompilation is bounded: distinct (L, N) buckets, not distinct inputs,
trigger compiles. k <= 128 on this path (2/4/6/8-word u32 keys, matching
the reference KMER_LIST spans).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from kmtricks_tpu.host.ops import SampleCounts
from kmtricks_tpu.ops import u64 as U
from kmtricks_tpu.ops.count_merge import count_merge_keys
from kmtricks_tpu.ops.encode import encode_batch, encode_batch_wide
from kmtricks_tpu.ops.xxh64 import window_hash

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
    B = _round_up(len(seqs))    # bucket rows too: bounded recompiles
    batch = np.full((B, L), ord("N"), dtype=np.uint8)
    lengths = np.zeros(B, dtype=np.int32)
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
    mmer_canonical: bool = True,
) -> SampleCounts:
    """Device-path equivalent of host.ops.count_sequences (k <= 128)."""
    assert k <= 128, "device path supports k <= 128"
    nb_parts = int(repart_table.max()) + 1 if len(repart_table) else 1
    table_dev = jnp.asarray(repart_table.astype(np.int32))

    batch, lengths = pad_reads(sequences, k)
    out = SampleCounts(kmer_size=k, nb_partitions=nb_parts)
    if batch.shape[0] == 0:
        return out

    # transposed (L, B) batch: sequence along sublanes (~20% cheaper encode)
    bj = jnp.asarray(np.ascontiguousarray(batch.T))
    lj = jnp.asarray(lengths)
    if k <= 32:
        hi, lo, parts, valid = encode_batch(bj, lj, table_dev, k, m,
                                            seq_axis=0,
                                            mmer_canonical=mmer_canonical)
        keys = (hi, lo)
    else:
        keys, parts, valid = encode_batch_wide(bj, lj, table_dev, k, m,
                                               seq_axis=0,
                                               mmer_canonical=mmer_canonical)
    keys = tuple(w.ravel() for w in keys)
    parts, valid = parts.ravel(), valid.ravel()
    if mode == "hash":
        assert window_bits is not None
        keys = window_hash(U.msb_words_to_u64_pairs(keys), parts,
                           window_bits)

    zeros = jnp.zeros_like(parts)
    key_bits = ((window_bits * nb_parts - 1).bit_length()
                if mode == "hash" else None)
    (part_s, keys_s, _samp, _final, cnt, present, _rh, _rk, _ro,
     _stats) = count_merge_keys(
        parts, keys, zeros, valid, jnp.ones(1, dtype=jnp.uint32),
        nsamp=1, hard_min=1, rmin=1, save_if=0,
        part_follows_keys=(mode == "hash"),
        key_bits=key_bits if mode == "hash" else 2 * k,
        window_bits=window_bits if mode == "hash" else None,
        part_bits=(((nb_parts - 1).bit_length())
                   if mode == "kmer" else None))

    part_s = np.asarray(part_s)
    present = np.asarray(present).astype(bool)
    cnt = np.asarray(cnt)
    words = [np.asarray(w) for w in keys_s]
    if mode == "hash":
        h = U.to_u64_np(words[0], words[1])
        kparts = (h // np.uint64(window_bits)).astype(np.int64)
        keys_np = h.reshape(-1, 1)
    else:
        kparts = part_s.astype(np.int64)
        keys_np = U.msb_words_to_u64_rows_np(words)

    keys_np, kparts, counts = keys_np[present], kparts[present], cnt[present]
    if hist is not None:
        hist.inc_counts(counts)
    out.n_kmers_total = int(present.sum())
    counts = counts.astype(np.uint64)
    solid = counts >= hard_min
    keys_np, kparts = keys_np[solid], kparts[solid]
    counts = np.minimum(counts[solid], np.uint64(count_max)).astype(
        np.uint32)

    for p in range(nb_parts):
        sel = kparts == p
        pk = keys_np[sel]
        out.partitions[p] = (pk if mode == "kmer" else pk.ravel(),
                             counts[sel])
    return out
