"""Pallas merge-path run merges for packed sort words.

The mesh receiver's routed-run merge: the all_to_all delivers one
ascending run per peer, so log2(ndev) merge-path levels replace a full
re-sort (measured on v5e, 8 runs x 512k: 6.1 vs 9.8 ms single-word;
wins through 5-word layouts, NOTES.md). Per level, pairs of sorted runs
merge block-wise: the (A, B) split point per 8192-wide output block is
found by a vectorized binary search OUTSIDE the kernel (tiny XLA
gathers), prefetched, then the block's two windows are DMA'd in and
merged with one Batcher odd-even merge (sentinel-masked). O(1) HBM
passes per level.

Signed trick: u32 keys are bitcast to i32 with the sign bit flipped
(x ^ 0x80000000), so signed min/max implement unsigned compares.

The full Pallas SORT that once shared this module (bitonic tile phase +
these merge levels) measured 16.2 ms vs lax.sort's 10.8 ms at 4.19M and
was evicted in r4 — git history keeps it; lax.sort is the sort floor.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

I32 = jnp.int32
U32 = jnp.uint32
LANES = 128
SUB = 64
TILE = SUB * LANES            # 8192: base sorted-run length
SIGN = np.uint32(0x80000000)
BIG = np.int32(0x7FFFFFFF)


def _butterfly(x, d: int):
    """y[i] = x[i ^ d] over a tile, memory-flat index (d a power of 2)."""
    R, C = x.shape
    if d < C:
        up = pltpu.roll(x, C - d, axis=1)     # up[i] = x[i+d] (lane-local)
        dn = pltpu.roll(x, d, axis=1)         # dn[i] = x[i-d]
        col = jax.lax.broadcasted_iota(I32, (R, C), 1)
        return jnp.where((col & d) == 0, up, dn)
    rd = d // C
    up = pltpu.roll(x, R - rd, axis=0)
    dn = pltpu.roll(x, rd, axis=0)
    row = jax.lax.broadcasted_iota(I32, (R, C), 0)
    return jnp.where((row & rd) == 0, up, dn)


def _flat_idx(shape):
    row = jax.lax.broadcasted_iota(I32, shape, 0)
    col = jax.lax.broadcasted_iota(I32, shape, 1)
    return row * shape[1] + col

def _stage(x, idx, k: int, d: int):
    """One compare-exchange stage of the bitonic network: partner at XOR
    distance d, ascending iff (i & k) == 0 (k = 0 -> all ascending)."""
    part = _butterfly(x, d)
    lo = jnp.minimum(x, part)
    hi = jnp.maximum(x, part)
    upper = (idx & d) != 0          # i is the higher of the pair
    desc = ((idx & k) != 0) if k else jnp.zeros_like(upper)
    return jnp.where(upper ^ desc, hi, lo)


def _flat_shift_up(x, r: int):
    """y[i] = x[i+r] (memory-flat, circular — callers mask the wrap)."""
    R, C = x.shape
    a, b = divmod(r, C)
    if a:
        x = pltpu.roll(x, R - a, axis=0)
    if b:
        col = jax.lax.broadcasted_iota(I32, (R, C), 1)
        z = pltpu.roll(x, C - b, axis=1)
        z2 = pltpu.roll(z, R - 1, axis=0)
        x = jnp.where(col < C - b, z, z2)
    return x


def _flat_shift_down(x, r: int):
    """y[i] = x[i-r] (memory-flat, circular — callers mask the wrap)."""
    R, C = x.shape
    a, b = divmod(r, C)
    if a:
        x = pltpu.roll(x, a, axis=0)
    if b:
        col = jax.lax.broadcasted_iota(I32, (R, C), 1)
        z = pltpu.roll(x, b, axis=1)
        z2 = pltpu.roll(z, 1, axis=0)
        x = jnp.where(col >= b, z, z2)
    return x


def _oem_merge_halves(x):
    """Batcher odd-even merge of a (2S, C) tile whose flat halves are each
    sorted ascending (no reversal needed, unlike the bitonic merge —
    Mosaic has no `rev`). Stages: CE(i, i+E) then, for r = E/2..1,
    CE(i, i+r) on i = r (mod 2r)."""
    idx = _flat_idx(x.shape)
    n2 = x.shape[0] * x.shape[1]
    E = n2 // 2
    x = _stage(x, idx, 0, E)          # pairs (i, i^E) == (i, i+E) for i < E
    r = E // 2
    while r >= 1:
        up = _flat_shift_up(x, r)
        dn = _flat_shift_down(x, r)
        # stage r: CE(i, i+r) for every i with bit r set, i < n2 - r
        act_lo = ((idx & r) != 0) & (idx < n2 - r)
        act_hi = ((idx & r) == 0) & (idx >= 2 * r)
        y = jnp.where(act_lo, jnp.minimum(x, up), x)
        x = jnp.where(act_hi, jnp.maximum(y, dn), y)
        r //= 2
    return x


ALIGN = 1024                  # HBM slice offsets must be 1024-divisible


def _dyn_normalize(win, alpha):
    """Shift a (SUB+8, LANES) window flat-up by dynamic alpha in
    [0, ALIGN): bit-decomposed into conditional static circular rolls
    (Mosaic-safe; the wrapped tail never reaches the first TILE
    elements because alpha < ALIGN)."""
    p = 1
    while p < ALIGN:
        win = jnp.where((alpha & p) != 0, _flat_shift_up(win, p), win)
        p <<= 1
    return win


def _merge_kernel(log2r: int, splits_ref, x_ref, o_ref, awin, bwin, sems):
    """Merge-path block merge (see module docstring). DMA offsets are
    rounded down to ALIGN (Mosaic requires tiling-divisible dynamic
    offsets); windows are TILE+ALIGN wide and normalized in-VMEM."""
    o = pl.program_id(0)
    R = 1 << log2r
    g = o * TILE
    pair = g >> (log2r + 1)
    d0 = g - (pair << (log2r + 1))
    a0 = splits_ref[o]
    a1 = splits_ref[o + 1]
    last_of_pair = (d0 + TILE) >= (2 * R)
    a1 = jnp.where(last_of_pair, R, a1)
    na = a1 - a0
    nb = TILE - na
    b0 = d0 - a0
    abase = pair << (log2r + 1)
    bbase = abase + R

    astart = abase + a0
    bstart = bbase + b0
    astart_al = (astart // ALIGN) * ALIGN
    bstart_al = (bstart // ALIGN) * ALIGN
    cp_a = pltpu.make_async_copy(
        x_ref.at[pl.ds(astart_al, TILE + ALIGN)], awin, sems.at[0])
    cp_b = pltpu.make_async_copy(
        x_ref.at[pl.ds(bstart_al, TILE + ALIGN)], bwin, sems.at[1])
    cp_a.start()
    cp_b.start()
    cp_a.wait()
    cp_b.wait()

    rows = (TILE + ALIGN) // LANES
    a2 = _dyn_normalize(awin[...].reshape(rows, LANES),
                        astart - astart_al)[:SUB]
    b2 = _dyn_normalize(bwin[...].reshape(rows, LANES),
                        bstart - bstart_al)[:SUB]
    idx = _flat_idx((SUB, LANES))
    a2 = jnp.where(idx < na, a2, BIG)
    b2 = jnp.where(idx < nb, b2, BIG)
    merged = _oem_merge_halves(jnp.concatenate([a2, b2], axis=0))
    o_ref[...] = merged[:SUB]


def _merge_splits(x, log2r: int):
    """Vectorized binary search for per-block merge-path splits (XLA).

    For output-block boundary g: a = elements the merged prefix of length
    d0 = g mod 2R takes from the A run; P(a) = A[a-1] <= B[d0-a] is
    monotone non-increasing in a — find the largest a with P(a)."""
    n = x.shape[0]
    R = 1 << log2r
    nblocks = n // TILE
    o = jnp.arange(nblocks + 1, dtype=I32)
    g = o * TILE
    pair = g >> (log2r + 1)
    d0 = g - (pair << (log2r + 1))
    abase = pair << (log2r + 1)
    bbase = abase + R
    lo = jnp.maximum(0, d0 - R)
    hi = jnp.minimum(R, d0)
    for _ in range(log2r + 1):
        mid = (lo + hi + 1) >> 1
        av = x[jnp.clip(abase + mid - 1, 0, n - 1)]
        bv = x[jnp.clip(bbase + d0 - mid, 0, n - 1)]
        guard_b = (d0 - mid) >= R          # B exhausted -> +inf
        ok = (mid <= lo) | guard_b | (av <= bv)
        take = ok & (mid <= hi)
        lo = jnp.where(take, mid, lo)
        hi = jnp.where(take, hi, jnp.minimum(hi, mid - 1))
    return lo.astype(I32)


def _merge_levels(cur, log2r: int, interpret: bool):
    """Run the merge-path levels from run length 2^log2r up to the full
    array (shared by the full sort and the routed-run merge).

    Windows overfetch up to one tile + ALIGN past a run's end;
    out-of-bounds DMA starts are clamped (shifting the window!), so the
    input of each level carries two sentinel tiles of padding."""
    n = cur.shape[0]
    tiles = n // TILE
    shape2 = (n // LANES, LANES)
    big_tile = jnp.full((TILE,), BIG, dtype=jnp.int32)
    while (1 << log2r) < n:
        splits = _merge_splits(cur, log2r)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(tiles,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec((SUB, LANES), lambda i, *_: (i, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((TILE + 1024,), jnp.int32),
                            pltpu.VMEM((TILE + 1024,), jnp.int32),
                            pltpu.SemaphoreType.DMA((2,))],
        )
        cur = pl.pallas_call(
            partial(_merge_kernel, log2r),
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct(shape2, jnp.int32),
            interpret=interpret,
        )(splits, jnp.concatenate([cur, big_tile, big_tile])).reshape(n)
        log2r += 1
    return cur



@partial(jax.jit, static_argnames=("run_len", "interpret"))
def _merge_runs_pow2(x, run_len: int, interpret: bool = False):
    """Merge ``n // run_len`` ascending runs (everything a power of two,
    run_len >= TILE) into one ascending array: just the top
    log2(n / run_len) top merge-path levels (each incoming run is
    already ascending)."""
    n = x.shape[0]
    assert n & (n - 1) == 0 and run_len & (run_len - 1) == 0
    assert run_len >= TILE and n > run_len and n % run_len == 0
    cur = jax.lax.bitcast_convert_type(x ^ SIGN, jnp.int32)
    return jax.lax.bitcast_convert_type(
        _merge_levels(cur, run_len.bit_length() - 1, interpret),
        jnp.uint32) ^ SIGN


# ---------------------------------------------------------------------------
# Multi-word routed-run merge: the mesh receiver's case for the 2/3-word
# packed layouts (h2, k2, k3, kw) — identical merge-path structure, but each
# element is a TUPLE of u32 words compared lexicographically (msb-first).
# Every compare-exchange becomes: butterfly each word, one lexicographic
# compare, then a single whole-tuple select per word. Cost grows ~linearly
# with the word count (NOTES.md estimates: win at 2 words, wash at 3) while
# the lax.sort re-sort it replaces grows with operand count too.
# ---------------------------------------------------------------------------


def _lt_words(a, b):
    """Lexicographic a < b over msb-first word tuples (sign-flipped i32:
    per-word signed compares implement the unsigned order)."""
    lt = a[0] < b[0]
    eq = a[0] == b[0]
    for aw, bw in zip(a[1:], b[1:]):
        lt = lt | (eq & (aw < bw))
        eq = eq & (aw == bw)
    return lt


def _stage_mw(ws, idx, k: int, d: int):
    """Multi-word compare-exchange stage of the bitonic network."""
    parts = tuple(_butterfly(w, d) for w in ws)
    x_lt_p = _lt_words(ws, parts)
    upper = (idx & d) != 0
    desc = ((idx & k) != 0) if k else jnp.zeros_like(upper)
    want_max = upper ^ desc
    # max keeps the partner iff self < partner; min iff self >= partner
    # (ties: either side is the same tuple). Written as a boolean equality
    # rather than where(bool, bool, bool): Mosaic cannot lower the latter's
    # i1 select (arith.trunci i8->i1 "Unsupported target bitwidth").
    take_partner = want_max == x_lt_p
    return tuple(jnp.where(take_partner, p, w) for w, p in zip(ws, parts))


def _oem_merge_halves_mw(ws):
    """Multi-word Batcher odd-even merge (see _oem_merge_halves)."""
    idx = _flat_idx(ws[0].shape)
    n2 = ws[0].shape[0] * ws[0].shape[1]
    E = n2 // 2
    ws = _stage_mw(ws, idx, 0, E)
    r = E // 2
    while r >= 1:
        ups = tuple(_flat_shift_up(w, r) for w in ws)
        dns = tuple(_flat_shift_down(w, r) for w in ws)
        act_lo = ((idx & r) != 0) & (idx < n2 - r)
        act_hi = ((idx & r) == 0) & (idx >= 2 * r)
        # y = min(x, up) where act_lo (take up iff up <= x)
        take_up = act_lo & ~_lt_words(ws, ups)
        ys = tuple(jnp.where(take_up, u, w) for w, u in zip(ws, ups))
        # x = max(y, dn) where act_hi (dn comes from pre-update x: act_lo
        # and act_hi are disjoint, so ys == ws at act_hi positions)
        take_dn = act_hi & _lt_words(ys, dns)
        ws = tuple(jnp.where(take_dn, dnw, yw) for yw, dnw in zip(ys, dns))
        r //= 2
    return ws


def _merge_kernel_mw(nw: int, log2r: int, splits_ref, *refs):
    """Multi-word merge-path block merge: per-word DMAs (same offsets),
    per-word in-VMEM normalization, one multi-word OEM merge."""
    x_refs = refs[:nw]
    o_refs = refs[nw:2 * nw]
    awins = refs[2 * nw:3 * nw]
    bwins = refs[3 * nw:4 * nw]
    sems = refs[4 * nw]
    o = pl.program_id(0)
    R = 1 << log2r
    g = o * TILE
    pair = g >> (log2r + 1)
    d0 = g - (pair << (log2r + 1))
    a0 = splits_ref[o]
    a1 = splits_ref[o + 1]
    last_of_pair = (d0 + TILE) >= (2 * R)
    a1 = jnp.where(last_of_pair, R, a1)
    na = a1 - a0
    nb = TILE - na
    b0 = d0 - a0
    abase = pair << (log2r + 1)
    bbase = abase + R

    astart = abase + a0
    bstart = bbase + b0
    astart_al = (astart // ALIGN) * ALIGN
    bstart_al = (bstart // ALIGN) * ALIGN
    cps = []
    for w in range(nw):
        cps.append(pltpu.make_async_copy(
            x_refs[w].at[pl.ds(astart_al, TILE + ALIGN)], awins[w],
            sems.at[0, w]))
        cps.append(pltpu.make_async_copy(
            x_refs[w].at[pl.ds(bstart_al, TILE + ALIGN)], bwins[w],
            sems.at[1, w]))
    for cp in cps:
        cp.start()
    for cp in cps:
        cp.wait()

    rows = (TILE + ALIGN) // LANES
    idx = _flat_idx((SUB, LANES))
    halves = []
    for w in range(nw):
        a2 = _dyn_normalize(awins[w][...].reshape(rows, LANES),
                            astart - astart_al)[:SUB]
        b2 = _dyn_normalize(bwins[w][...].reshape(rows, LANES),
                            bstart - bstart_al)[:SUB]
        # run-exhausted slots become +inf in EVERY word so the
        # lexicographic compare sends them to the tail
        a2 = jnp.where(idx < na, a2, BIG)
        b2 = jnp.where(idx < nb, b2, BIG)
        halves.append(jnp.concatenate([a2, b2], axis=0))
    merged = _oem_merge_halves_mw(tuple(halves))
    for w in range(nw):
        o_refs[w][...] = merged[w][:SUB]


def _merge_splits_mw(ws, log2r: int):
    """_merge_splits with a lexicographic multi-word compare."""
    n = ws[0].shape[0]
    R = 1 << log2r
    nblocks = n // TILE
    o = jnp.arange(nblocks + 1, dtype=I32)
    g = o * TILE
    pair = g >> (log2r + 1)
    d0 = g - (pair << (log2r + 1))
    abase = pair << (log2r + 1)
    bbase = abase + R
    lo = jnp.maximum(0, d0 - R)
    hi = jnp.minimum(R, d0)
    for _ in range(log2r + 1):
        mid = (lo + hi + 1) >> 1
        ai = jnp.clip(abase + mid - 1, 0, n - 1)
        bi = jnp.clip(bbase + d0 - mid, 0, n - 1)
        av = tuple(w[ai] for w in ws)
        bv = tuple(w[bi] for w in ws)
        guard_b = (d0 - mid) >= R          # B exhausted -> +inf
        ok = (mid <= lo) | guard_b | ~_lt_words(bv, av)
        take = ok & (mid <= hi)
        lo = jnp.where(take, mid, lo)
        hi = jnp.where(take, hi, jnp.minimum(hi, mid - 1))
    return lo.astype(I32)


def _merge_levels_mw(cur_ws, log2r: int, interpret: bool):
    """Multi-word merge-path levels (see _merge_levels for the DMA
    padding contract)."""
    nw = len(cur_ws)
    n = cur_ws[0].shape[0]
    tiles = n // TILE
    shape2 = (n // LANES, LANES)
    big_tile = jnp.full((TILE,), BIG, dtype=jnp.int32)
    ospec = pl.BlockSpec((SUB, LANES), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM)
    while (1 << log2r) < n:
        splits = _merge_splits_mw(cur_ws, log2r)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(tiles,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * nw,
            out_specs=[ospec] * nw,
            scratch_shapes=(
                [pltpu.VMEM((TILE + 1024,), jnp.int32)] * (2 * nw)
                + [pltpu.SemaphoreType.DMA((2, nw))]),
        )
        outs = pl.pallas_call(
            partial(_merge_kernel_mw, nw, log2r),
            grid_spec=grid_spec,
            out_shape=[jax.ShapeDtypeStruct(shape2, jnp.int32)] * nw,
            interpret=interpret,
        )(splits, *(jnp.concatenate([w, big_tile, big_tile])
                    for w in cur_ws))
        cur_ws = tuple(o.reshape(n) for o in outs)
        log2r += 1
    return cur_ws


@partial(jax.jit, static_argnames=("run_len", "interpret"))
def _merge_runs_pow2_mw(ws, run_len: int, interpret: bool = False):
    """Multi-word twin of _merge_runs_pow2."""
    n = ws[0].shape[0]
    assert n & (n - 1) == 0 and run_len & (run_len - 1) == 0
    assert run_len >= TILE and n > run_len and n % run_len == 0
    cur = tuple(jax.lax.bitcast_convert_type(w ^ SIGN, jnp.int32)
                for w in ws)
    out = _merge_levels_mw(cur, run_len.bit_length() - 1, interpret)
    return tuple(jax.lax.bitcast_convert_type(w, jnp.uint32) ^ SIGN
                 for w in out)


def merge_sorted_runs_words(ws2d, interpret: bool | None = None):
    """Multi-word :func:`merge_sorted_runs_u32`: ``ws2d`` is a tuple of
    (nruns, run_len) u32 arrays forming msb-first packed sort words; each
    run (row, read across all words) is ascending with all-ones sentinel
    tail padding. Returns the merged flat word tuple (nruns * run_len
    each). Fallbacks mirror the single-word entry."""
    nw = len(ws2d)
    if nw == 1:
        return (merge_sorted_runs_u32(ws2d[0], interpret=interpret),)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    nruns, cap = ws2d[0].shape
    pad_runs = 1 << max(0, (nruns - 1)).bit_length()
    r = 1 << (cap - 1).bit_length()
    if nruns < 2 or pad_runs != nruns or r < TILE:
        return jax.lax.sort(tuple(w.reshape(-1) for w in ws2d),
                            dimension=0, num_keys=nw)
    if r != cap:
        pad = jnp.full((nruns, r - cap), 0xFFFFFFFF, dtype=U32)
        ws2d = tuple(jnp.concatenate([w, pad], axis=1) for w in ws2d)
    out = _merge_runs_pow2_mw(tuple(w.reshape(-1) for w in ws2d), r,
                              interpret=interpret)
    # the added sentinels (all-ones in every word — never a valid packed
    # value: word0's top validity bit is 0) sort to the tail
    return tuple(w[:nruns * cap] for w in out)


def merge_sorted_runs_u32(x2d, interpret: bool | None = None):
    """Merge the rows of an (nruns, run_len) u32 array — each row
    ascending (0xFFFFFFFF sentinel padding at row tails keeps a row
    sorted) — into one ascending (nruns * run_len,) array.

    This is the mesh receiver's case: the all_to_all delivers one
    ascending run per peer, so a log2(nruns)-level merge replaces a full
    re-sort (~3 merge levels vs ~242 lax.sort stages at ndev = 8). Rows
    are sentinel-padded to a power-of-two run length; non-power-of-two
    run counts or sub-TILE runs fall back to lax.sort.

    ``interpret`` defaults to True off-TPU (the Mosaic kernels only
    compile for TPU; interpret mode keeps CPU tests honest)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    nruns, cap = x2d.shape
    pad_runs = 1 << max(0, (nruns - 1)).bit_length()
    r = 1 << (cap - 1).bit_length()
    if nruns < 2 or pad_runs != nruns or r < TILE:
        (s,) = jax.lax.sort((x2d.reshape(-1),), dimension=0, num_keys=1)
        return s
    if r != cap:
        x2d = jnp.concatenate(
            [x2d, jnp.full((nruns, r - cap), 0xFFFFFFFF, dtype=U32)],
            axis=1)
    s = _merge_runs_pow2(x2d.reshape(-1), r, interpret=interpret)
    # the added sentinels sort to the tail (a valid packed word is never
    # all-ones: its top validity bit is 0) — slice back to the true size
    return s[:nruns * cap]
