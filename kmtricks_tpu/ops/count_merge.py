"""Fused device kernel: raw k-mer occurrences -> merged matrix rows.

Fuses the reference's per-sample counting (gatb/sorting_count.hpp sort+RLE +
count_processor.hpp hard-min/saturate) with the cross-sample merge + rescue
(merge.hpp:183-260) into ONE sort + segment-reduce program:

  sort (partition, key, sample) occurrence tuples
  -> (key, sample) run lengths           = per-sample counts
  -> hard-min filter                      (count_processor.hpp:61-72)
  -> per-key solid tally + rescue/zeroing (merge.hpp:234-247)
  -> per-sample statistics                (merge.hpp:49-100)

Everything is fixed-shape with validity masks; invalid/padded entries sort to
the end and never form segments. Compaction happens on host (or downstream).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

U32 = jnp.uint32
I32 = jnp.int32


@partial(jax.jit, static_argnames=("nsamp", "hard_min", "rmin", "save_if",
                                   "count_max"))
def count_merge_flat(part, hi, lo, samp, valid, amin_vec, *, nsamp: int,
                     hard_min: int, rmin: int, save_if: int,
                     count_max: int = 0xFFFFFFFF):
    """Count and merge raw occurrences in one pass.

    Parameters
    ----------
    part : (N,) int32 partition id of each occurrence
    hi/lo : (N,) uint32 64-bit key words (packed canonical k-mer or hash)
    samp : (N,) int32 sample ids in [0, nsamp)
    valid : (N,) bool padding mask
    amin_vec : (nsamp,) uint32 per-sample soft-min (merge abundance) thresholds

    Returns (all length N, sorted by (partition, key, sample), padding last)
    -------
    part_s, hi_s, lo_s, samp_s : sorted tuples
    final : (N,) uint32 post-hard-min, post-rescue-zeroing counts
            (meaningful at ``present`` positions)
    present : (N,) bool — (key, sample) run head that survived hard-min
    row_head : (N,) bool — first PRESENT entry of each distinct (part, key);
               keys entirely below hard-min produce no row (they never reach
               the reference's merge inputs)
    row_keep : (N,) bool at row_head positions — recurrence >= rmin verdict
    row_of : (N,) int32 — dense row index of each position's key
    stats : (6, nsamp) uint32 — NON_SOLID, RESCUED, UNIQUE_WO_RESCUE,
            UNIQUE_W_RESCUE, TOTAL_WO_RESCUE, TOTAL_W_RESCUE
    """
    n = hi.shape[0]
    inv = (~valid).astype(U32)
    inv_s, part_s, hi_s, lo_s, samp_s = jax.lax.sort(
        (inv, part.astype(U32), hi, lo, samp.astype(U32)),
        dimension=0, num_keys=5)
    valid_s = inv_s == 0
    samp_i = samp_s.astype(I32)

    ones = jnp.ones((n,), dtype=bool)
    key_diff = ones.at[1:].set((part_s[1:] != part_s[:-1])
                               | (hi_s[1:] != hi_s[:-1])
                               | (lo_s[1:] != lo_s[:-1]))
    samp_diff = ones.at[1:].set(samp_s[1:] != samp_s[:-1])
    occ_head = (key_diff | samp_diff) & valid_s
    key_head = key_diff & valid_s

    occ_of = jnp.maximum(jnp.cumsum(occ_head.astype(I32)) - 1, 0)
    row_of_raw = jnp.maximum(jnp.cumsum(key_head.astype(I32)) - 1, 0)

    occ_cnt = jax.ops.segment_sum(valid_s.astype(U32), occ_of, num_segments=n)
    cnt_raw = occ_cnt[occ_of]                      # per-sample raw count
    present = occ_head & (cnt_raw >= hard_min)     # hard-min at count stage
    cnt = jnp.minimum(cnt_raw, U32(count_max))     # saturating store

    # A matrix row exists only for keys present (post hard-min) in >= 1
    # sample — keys entirely below hard-min never reach the reference's
    # merge inputs. Mark the FIRST present entry of each key as the row head.
    excl = jnp.cumsum(present.astype(I32)) - present.astype(I32)
    group_base = jax.lax.cummax(jnp.where(key_head, excl, 0))
    row_head = present & (excl == group_base)
    row_of = jnp.maximum(jnp.cumsum(row_head.astype(I32)) - 1, 0)

    amin = jnp.asarray(amin_vec, dtype=U32)
    solid = present & (cnt >= amin[samp_i])
    solid_in_row = jax.ops.segment_sum(solid.astype(I32), row_of_raw,
                                       num_segments=n)
    solid_in = solid_in_row[row_of_raw]

    if save_if > 0:
        rescued = present & ~solid & (solid_in >= save_if)
    else:
        rescued = jnp.zeros_like(solid)
    final = jnp.where(solid | rescued, cnt, U32(0))
    row_keep = row_head & (solid_in >= rmin)

    def by_sample(v):
        return jax.ops.segment_sum(v.astype(U32), samp_i, num_segments=nsamp)

    stats = jnp.stack([
        by_sample(present & ~solid),                    # NON_SOLID
        by_sample(rescued),                             # RESCUED
        by_sample(solid),                               # UNIQUE_WO_RESCUE
        by_sample(solid | rescued),                     # UNIQUE_W_RESCUE
        by_sample(jnp.where(solid, cnt, U32(0))),       # TOTAL_WO_RESCUE
        by_sample(final),                               # TOTAL_W_RESCUE
    ])
    return (part_s.astype(I32), hi_s, lo_s, samp_i, final,
            present, row_head, row_keep, row_of, stats)
