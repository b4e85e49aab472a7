"""Device count kernel: sort + run-length segment count.

The TPU-native equivalent of the reference's radix-bucket sort + kx-mer
heap merge (gatb/sorting_count.hpp KmerPartCounter / HashPartCounter):
``jax.lax.sort`` over multiple uint32 key operands is already fully
vectorized, so the kx-mer trick is unnecessary — we co-sort
(partition, key) tuples and run-length count with masked prefix ops.

Fixed-shape contract: inputs are flat padded arrays with a validity mask;
outputs keep full shape plus a ``head`` mask marking distinct keys (host
or a downstream kernel compacts).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from kmtricks_tpu.ops import u64 as U
from kmtricks_tpu.ops.xxh64 import window_hash

U32 = jnp.uint32
I32 = jnp.int32


def _rle(keys_ops: tuple, invalid):
    """Shared run-length logic over already-sorted key operands.

    Returns (head mask, counts aligned to head positions).
    """
    n = keys_ops[0].shape[0]
    idx = jax.lax.iota(I32, n)
    diff = jnp.zeros((n,), dtype=bool)
    for op in keys_ops:
        d = jnp.ones((n,), dtype=bool).at[1:].set(op[1:] != op[:-1])
        diff = diff | d
    head = diff & ~invalid
    # boundary positions: heads and the first invalid element terminate runs
    bound = jnp.where(head | invalid, idx, n)
    # next boundary strictly after i: suffix-min of bound shifted left by one
    nxt = jnp.concatenate([bound[1:], jnp.array([n], dtype=I32)])
    nxt = jax.lax.associative_scan(jnp.minimum, nxt, reverse=True)
    counts = jnp.where(head, nxt - idx, 0)
    return head, counts


@jax.jit
def count_kmers(hi, lo, parts, valid):
    """Sort (partition, canonical k-mer) tuples and run-length count.

    Returns sorted (hi, lo, parts) + head mask + counts-at-heads.
    Invalid entries sort to the end and never form segments.
    """
    inv = (~valid).astype(U32)
    pu = parts.astype(U32)
    inv_s, pu_s, hi_s, lo_s = jax.lax.sort(
        (inv, pu, hi, lo), dimension=0, num_keys=4)
    head, counts = _rle((pu_s, hi_s, lo_s), inv_s.astype(bool))
    return hi_s, lo_s, pu_s.astype(I32), head, counts


@partial(jax.jit, static_argnames=("window_bits",))
def count_hashes(hi, lo, parts, valid, window_bits: int):
    """Hash-mode counting: window hash of each canonical k-mer, sort, RLE.

    The hash embeds the partition (h % w + w*p), so sorting by hash alone
    yields partition-grouped ascending order, exactly like the per-partition
    files of the reference.
    """
    h = window_hash([(hi, lo)], parts, window_bits)
    inv = (~valid).astype(U32)
    inv_s, hh_s, hl_s = jax.lax.sort((inv, h[0], h[1]), dimension=0, num_keys=3)
    head, counts = _rle((hh_s, hl_s), inv_s.astype(bool))
    return hh_s, hl_s, head, counts
