"""Fused Pallas segmented-scan kernels for the count+merge stage.

The XLA implementation of the post-sort stage (ops/count_merge.py
``_segment_stage``) spends ~7 separate cumulative passes
(cumsum/cummax/cummin), each a full HBM round-trip costing ~3.5 ms at
N = 4.19M on a v5e — ~12 ms total, the largest share of the fused step
after the sort. These kernels compute the same quantities in TWO
sequential-grid streaming passes with carries, O(1) HBM round-trips:

  backward pass: next-boundary distance -> per-occurrence run length
    (the reference's sort+RLE counting, gatb/sorting_count.hpp:965-990),
    hard-min/saturation (count_processor.hpp:61-72), and the per-key
    suffix-solid count;
  forward pass: head solid_in distribution (rescue, merge.hpp:234-247),
    row heads/keeps, and the dense row index.

Within a tile, scans use log-doubling over ``pltpu.roll`` with
carry scalars in SMEM between grid steps (the TPU grid is sequential).
Everything is int32: counts/indices are < 2^31 and Mosaic has no
unsigned min.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

I32 = jnp.int32
LANES = 128
SUB = 64                       # sublanes per tile -> 8192 elements
TILE = SUB * LANES
BIG = np.int32(2**31 - 1)


def _shift_up(x, s: int, fill):
    """Memory-flat shift toward lower index: y[i] = x[i+s], tail = fill.

    x is a (SUB, LANES) tile viewed flat row-major."""
    R, C = x.shape
    a, b = divmod(s, C)
    row = jax.lax.broadcasted_iota(I32, (R, C), 0)
    col = jax.lax.broadcasted_iota(I32, (R, C), 1)
    if a:
        x = jnp.where(row < R - a, pltpu.roll(x, R - a, axis=0), fill)
    if b:
        z = pltpu.roll(x, C - b, axis=1)            # z[r,c] = x[r,(c+b)%C]
        z2 = pltpu.roll(z, R - 1, axis=0)           # z2[r,c] = x[r+1,(c+b)%C]
        y = jnp.where(col < C - b, z, z2)
        x = jnp.where((col >= C - b) & (row == R - 1), fill, y)
    return x


def _shift_down(x, s: int, fill):
    """Memory-flat shift toward higher index: y[i] = x[i-s], head = fill."""
    R, C = x.shape
    a, b = divmod(s, C)
    row = jax.lax.broadcasted_iota(I32, (R, C), 0)
    col = jax.lax.broadcasted_iota(I32, (R, C), 1)
    if a:
        x = jnp.where(row >= a, pltpu.roll(x, a, axis=0), fill)
    if b:
        z = pltpu.roll(x, b, axis=1)                # z[r,c] = x[r,(c-b)%C]
        z2 = pltpu.roll(z, 1, axis=0)               # z2[r,c] = x[r-1,(c-b)%C]
        y = jnp.where(col >= b, z, z2)
        x = jnp.where((col < b) & (row == 0), fill, y)
    return x


def _powers(limit: int):
    s = 1
    while s < limit:
        yield s
        s <<= 1


def _suffix_min(x):
    """Within-tile inclusive suffix min (memory order)."""
    for s in _powers(TILE):
        x = jnp.minimum(x, _shift_up(x, s, BIG))
    return x


def _seg_suffix_sum(val, stop):
    """Within-tile segmented inclusive suffix sum.

    stop[i] = 1 -> the segment of i ends at i (no contribution from i+1
    onward). Returns (sum, crossed) where crossed[i] = 1 iff a stop exists
    in [i, tile_end]."""
    s_, f_ = val, stop
    for s in _powers(TILE):
        sh_s = _shift_up(s_, s, 0)
        sh_f = _shift_up(f_, s, 0)
        s_ = s_ + jnp.where(f_ > 0, 0, sh_s)
        f_ = f_ | sh_f
    return s_, f_


def _seg_prefix_or_max(val, head):
    """Within-tile segmented inclusive prefix max; segments restart at
    head[i] = 1 (the head's own value is included). Returns (max, seen)
    where seen[i] = 1 iff a head exists in [tile_start, i]."""
    v, f = val, head
    for s in _powers(TILE):
        sh_v = _shift_down(v, s, 0)
        sh_f = _shift_down(f, s, 0)
        v = jnp.where(f > 0, v, jnp.maximum(v, sh_v))
        f = f | sh_f
    return v, f


def _prefix_sum(x):
    """Within-tile inclusive prefix sum (memory order)."""
    for s in _powers(TILE):
        x = x + _shift_down(x, s, 0)
    return x


def _bwd_kernel(count_max: int, n_tiles: int,
                mark_ref, occ_head_ref, stop_ref, amin_ref, hmin_ref,
                cnt_ref, present_ref, solid_ref, suffix_ref,
                carry_nb, carry_ks):
    """Backward pass over tiles (grid reversed). Carries in SMEM:
    carry_nb[0] = min boundary index over later tiles;
    carry_ks[0,1] = (suffix solid sum, stop seen) entering from the right."""
    i = pl.program_id(0)
    t = n_tiles - 1 - i          # actual tile index (reverse order)
    base = t * TILE

    @pl.when(i == 0)
    def _():
        carry_nb[0] = n_tiles * TILE   # "no boundary" = array end
        carry_ks[0] = 0
        carry_ks[1] = 1          # beyond-N terminates the last segment

    row = jax.lax.broadcasted_iota(I32, (SUB, LANES), 0)
    col = jax.lax.broadcasted_iota(I32, (SUB, LANES), 1)
    gidx = base + row * LANES + col

    mark = mark_ref[...]
    bound = jnp.where(mark > 0, gidx, BIG)
    sufmin = _suffix_min(bound)
    # next boundary strictly after i: suffix min starting at i+1
    nxt_in = _shift_up(sufmin, 1, BIG)
    nxt = jnp.minimum(nxt_in, carry_nb[0])
    new_nb = jnp.minimum(sufmin[0, 0], carry_nb[0])

    occ_head = occ_head_ref[...]
    cnt_raw = jnp.where(occ_head > 0, nxt - gidx, 0)
    present = jnp.where(cnt_raw >= hmin_ref[...], occ_head, 0)
    if count_max < 2**31:
        cnt = jnp.minimum(cnt_raw, count_max)
    else:
        cnt = cnt_raw
    solid = jnp.where((present > 0) & (cnt >= amin_ref[...]), 1, 0)

    stop = stop_ref[...]
    s_w, f_w = _seg_suffix_sum(solid, stop)
    suffix = s_w + jnp.where(f_w > 0, 0, carry_ks[0])
    crossed0 = f_w[0, 0] | carry_ks[1]
    new_ks = suffix[0, 0]

    cnt_ref[...] = cnt
    present_ref[...] = present
    solid_ref[...] = solid
    suffix_ref[...] = suffix
    carry_nb[0] = new_nb
    carry_ks[0] = new_ks
    carry_ks[1] = crossed0


def _fwd_kernel(rmin: int, save_if: int,
                present_ref, solid_ref, suffix_ref, key_head_ref, cnt_ref,
                final_ref, row_head_ref, row_keep_ref, row_of_ref,
                carry_si, carry_emt, carry_rows):
    """Forward pass. Carries: carry_si = solid_in of the segment open at
    the tile boundary; carry_emt = 1 iff that segment already had a
    present entry; carry_rows = row heads emitted so far."""
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        carry_si[0] = 0
        carry_emt[0] = 0
        carry_rows[0] = 0

    present = present_ref[...]
    solid = solid_ref[...]
    suffix = suffix_ref[...]
    key_head = key_head_ref[...]
    cnt = cnt_ref[...]

    # distribute the head's solid_in (suffix at the head = segment total)
    si_w, seen_w = _seg_prefix_or_max(
        jnp.where(key_head > 0, suffix, 0), key_head)
    si = jnp.where(seen_w > 0, si_w, carry_si[0])

    # row head: first present entry of each key segment. before[i] = 1 iff
    # a present entry exists earlier in i's segment.
    pre_w, pseen_w = _seg_prefix_or_max(present, key_head)
    prev_present = _shift_down(pre_w, 1, 0)
    prev_pseen = _shift_down(pseen_w, 1, 0)
    before = jnp.where(key_head > 0, 0,
                       jnp.where(prev_pseen > 0, prev_present,
                                 jnp.maximum(prev_present, carry_emt[0])))
    row_head = jnp.where((present > 0) & (before == 0), 1, 0)

    if save_if > 0:
        rescued = jnp.where(
            (present > 0) & (solid == 0) & (si >= save_if), 1, 0)
    else:
        rescued = jnp.zeros_like(solid)
    final = jnp.where((solid > 0) | (rescued > 0), cnt, 0)
    row_keep = jnp.where((row_head > 0) & (si >= rmin), 1, 0)

    rof = _prefix_sum(row_head) + carry_rows[0] - 1
    row_of = jnp.maximum(rof, 0)

    final_ref[...] = final
    row_head_ref[...] = row_head
    row_keep_ref[...] = row_keep
    row_of_ref[...] = row_of

    # update carries from the tile's last element
    last = (SUB - 1, LANES - 1)
    carry_si[0] = jnp.where(seen_w[last] > 0, si_w[last], carry_si[0])
    carry_emt[0] = jnp.where(pseen_w[last] > 0, pre_w[last],
                             jnp.maximum(pre_w[last], carry_emt[0]))
    carry_rows[0] = carry_rows[0] + jnp.sum(row_head)


@partial(jax.jit, static_argnames=("rmin", "save_if",
                                   "count_max", "interpret"))
def segment_stage_pallas(occ_diff, key_diff, valid, amin_of, hmin_of, *,
                         rmin: int, save_if: int,
                         count_max: int, interpret: bool = False):
    """Fused replacement for the cumulative-primitive segment stage.

    Inputs are the full-length (N,) post-sort per-position arrays
    (bool/i32); outputs match ops/count_merge._segment_stage's
    cnt/present/solid/final/row_head/row_keep/row_of (i32/bool), computed
    identically (validated against the XLA path in tests)."""
    n = occ_diff.shape[0]
    pad = (-n) % TILE
    npad = n + pad
    if npad == 0:
        z = jnp.zeros((0,), jnp.int32)
        zb = jnp.zeros((0,), bool)
        return z, zb, zb, z, zb, zb, z

    occ = occ_diff.astype(I32)
    kd = key_diff.astype(I32)
    vld = valid.astype(I32)
    amin = jnp.asarray(amin_of).astype(I32)
    hmin = jnp.asarray(hmin_of).astype(I32)
    if pad:
        occ = jnp.concatenate([occ, jnp.ones((pad,), I32)])
        kd = jnp.concatenate([kd, jnp.ones((pad,), I32)])
        vld = jnp.concatenate([vld, jnp.zeros((pad,), I32)])
        amin = jnp.concatenate([amin, jnp.full((pad,), BIG, I32)])
        hmin = jnp.concatenate([hmin, jnp.full((pad,), BIG, I32)])

    mark = occ | (1 - vld)
    occ_head = occ * vld
    key_head = kd * vld
    # stop[i] = segment of i ends at i  <=>  key_diff[i+1] (or i = N-1)
    stop = jnp.concatenate([kd[1:], jnp.ones((1,), I32)])

    shape2 = (npad // LANES, LANES)
    tiles = npad // TILE
    grid = (tiles,)
    t2 = lambda a: a.reshape(shape2)

    bspec = pl.BlockSpec((SUB, LANES), lambda i: (tiles - 1 - i, 0),
                         memory_space=pltpu.VMEM)
    out4 = [jax.ShapeDtypeStruct(shape2, jnp.int32) for _ in range(4)]
    cnt, present, solid, suffix = pl.pallas_call(
        partial(_bwd_kernel, count_max, tiles),
        grid=grid,
        in_specs=[bspec] * 5,
        out_specs=[bspec] * 4,
        out_shape=out4,
        scratch_shapes=[pltpu.SMEM((1,), jnp.int32),
                        pltpu.SMEM((2,), jnp.int32)],
        interpret=interpret,
    )(t2(mark), t2(occ_head), t2(stop), t2(amin), t2(hmin))

    fspec = pl.BlockSpec((SUB, LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)
    final, row_head, row_keep, row_of = pl.pallas_call(
        partial(_fwd_kernel, rmin, save_if),
        grid=grid,
        in_specs=[fspec] * 5,
        out_specs=[fspec] * 4,
        out_shape=out4,
        scratch_shapes=[pltpu.SMEM((1,), jnp.int32),
                        pltpu.SMEM((1,), jnp.int32),
                        pltpu.SMEM((1,), jnp.int32)],
        interpret=interpret,
    )(present, solid, suffix, t2(key_head), cnt)

    flat = lambda a: a.reshape(npad)[:n]
    return (flat(cnt), flat(present) > 0, flat(solid) > 0, flat(final),
            flat(row_head) > 0, flat(row_keep) > 0, flat(row_of))
