"""Device-side row compaction: full-N kernel outputs -> dense matrix rows.

The fused count+merge kernel (ops/count_merge.py) returns N-sized sorted
occurrence arrays with validity masks. Fetching those to host costs
N * ~40 bytes over the device link — orders of magnitude more than the
information content (the distinct rows). This module compacts ON DEVICE to
exactly what the host writers need (the reference streams the same compact
rows straight out of its merge loop, merge.hpp:262-316):

  - ``ku``   (rows_cap, nw) u32  — each distinct key's words, row-major
  - ``mat``  (rows_cap, nsamp) u32 — post-rescue dense count matrix
  - ``keep`` (rows_cap,) bool   — recurrence verdict per row
  - ``part_rows`` (nb_parts,) i32 — rows per partition (rows are sorted by
    partition, so host-side partition splits are offsets, no per-row ids)
  - ``stats_pp`` (6, nb_parts, nsamp) u32 — per-partition merge statistics
    (merge.hpp:49-100), computed on device so the host never needs the
    N-sized present/cnt arrays
  - ``nrows`` () i32, ``maxc`` () u32 — actual row count (callers re-run
    with a bigger ``rows_cap`` if nrows > rows_cap) and the max matrix
    count (hosts fetch the matrix as u8/u16 when it fits)

Scatter note: this uses two N->rows_cap scatters (~27 ms at 4M on a v5e,
NOTES.md) — far cheaper than fetching N-sized arrays at the measured
~16 MB/s device link.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

U32 = jnp.uint32
I32 = jnp.int32

STATS_ROWS = 6   # NON_SOLID, RESCUED, UNIQ_WO, UNIQ_W, TOTAL_WO, TOTAL_W


def _amin_of(amin_vec, samp_i, nsamp: int):
    vec = jnp.asarray(amin_vec, dtype=U32)
    if nsamp <= 16:
        out = jnp.zeros(samp_i.shape, dtype=U32)
        for s in range(nsamp):
            out = jnp.where(samp_i == s, vec[s], out)
        return out
    return vec[samp_i]


def compact_merge_rows(part_s, keys_s, samp_s, final, cnt, present,
                       row_head, row_keep, amin_vec, *, rows_cap: int,
                       nsamp: int, nb_parts: int,
                       with_pp_stats: bool = True):
    """Compact one device's sorted merge output to dense rows (see module
    docstring). All inputs are the count_merge_* outputs; jit-traceable."""
    samp_i = samp_s.astype(I32)
    present = present.astype(bool)
    row_head = row_head.astype(bool)
    row_keep = row_keep.astype(bool)
    row_of = jnp.cumsum(row_head.astype(I32)) - 1
    nrows = row_of[-1] + 1 if row_of.shape[0] else jnp.int32(0)

    oob_flat = rows_cap * nsamp
    flat = jnp.where(present & (row_of < rows_cap),
                     row_of * nsamp + samp_i, oob_flat)
    mat = jnp.zeros((rows_cap * nsamp,), dtype=U32).at[flat].set(
        final.astype(U32), mode="drop").reshape(rows_cap, nsamp)

    ridx = jnp.where(row_head & (row_of < rows_cap), row_of, rows_cap)
    nw = len(keys_s)
    ku = jnp.zeros((rows_cap, nw), dtype=U32)
    for j, w in enumerate(keys_s):
        ku = ku.at[ridx, j].set(w.astype(U32), mode="drop")
    keep = jnp.zeros((rows_cap,), dtype=bool).at[ridx].set(
        row_keep, mode="drop")
    part_rows = jnp.zeros((nb_parts,), dtype=I32).at[
        jnp.where(row_head, part_s, nb_parts)].add(1, mode="drop")
    maxc = jnp.max(jnp.where(present, final.astype(U32), U32(0)))

    if with_pp_stats:
        amin = _amin_of(amin_vec, samp_i, nsamp)
        solid = present & (cnt.astype(U32) >= amin)
        rescued = present & ~solid & (final.astype(U32) > 0)
        seg = part_s.astype(I32) * nsamp + samp_i
        values = [
            (present & ~solid).astype(U32),          # NON_SOLID
            rescued.astype(U32),                     # RESCUED
            solid.astype(U32),                       # UNIQUE_WO_RESCUE
            (solid | rescued).astype(U32),           # UNIQUE_W_RESCUE
            jnp.where(solid, cnt.astype(U32), U32(0)),   # TOTAL_WO_RESCUE
            jnp.where(present, final.astype(U32), U32(0)),  # TOTAL_W_RESCUE
        ]
        stats_pp = jnp.stack([
            jax.ops.segment_sum(v, seg, num_segments=nb_parts * nsamp)
            for v in values]).reshape(STATS_ROWS, nb_parts, nsamp)
    else:
        stats_pp = jnp.zeros((STATS_ROWS, nb_parts, nsamp), dtype=U32)
    return ku, mat, keep, part_rows, stats_pp, nrows, maxc


# --- host-side fetch helpers -------------------------------------------

_TILE = 32768


@partial(jax.jit, static_argnames=("tile",))
def _slice_rows_u8(a, start, tile: int = _TILE):
    return jax.lax.dynamic_slice_in_dim(a, start, tile).astype(jnp.uint8)


@partial(jax.jit, static_argnames=("tile",))
def _slice_rows_u16(a, start, tile: int = _TILE):
    return jax.lax.dynamic_slice_in_dim(a, start, tile).astype(jnp.uint16)


@partial(jax.jit, static_argnames=("tile",))
def _slice_rows(a, start, tile: int = _TILE):
    return jax.lax.dynamic_slice_in_dim(a, start, tile)


def fetch_rows(arr, nrows: int, cast: str | None = None,
               tile: int = _TILE, offset: int = 0):
    """Fetch ``arr[offset:offset+nrows]`` over the device link in
    fixed-shape tiles.

    Tiles are dispatched and ``copy_to_host_async()``'d up front so the
    link streams continuously (each blocking device_get would otherwise
    pay a round-trip of latency); the tile slice compiles ONCE per array
    shape (dynamic_slice start is a traced scalar). ``cast``: "u8"/"u16"
    narrow the payload before it rides the link (callers check ``maxc``).
    """
    import numpy as np

    if nrows <= 0:
        shape = (0,) + arr.shape[1:]
        dt = {"u8": np.uint8, "u16": np.uint16}.get(cast, arr.dtype)
        return np.zeros(shape, dtype=dt)
    n = arr.shape[0]
    nrows = min(nrows, n - offset)
    tile = min(tile, n)
    fn = {"u8": _slice_rows_u8, "u16": _slice_rows_u16}.get(
        cast, _slice_rows)
    tiles = []
    for s in range(offset, offset + nrows, tile):
        start = min(s, max(0, n - tile))   # clamp: final tile overlaps
        tiles.append((start, fn(arr, start, tile)))
    for _, td in tiles:
        td.copy_to_host_async()
    out = []
    prev_end = offset
    for start, td in tiles:
        h = np.asarray(td)
        out.append(h[prev_end - start:])
        prev_end = start + tile
    res = np.concatenate(out, axis=0) if len(out) > 1 else out[0]
    return res[:nrows]


def fetch_matrix(mat_dev, nrows: int, maxc: int, offset: int = 0,
                 tile: int = _TILE):
    """Fetch a dense count-matrix block, narrowed to the smallest dtype
    that holds ``maxc`` (the device returns the max count as a scalar so
    the link never carries u32 zeros for u8 data)."""
    cast = "u8" if maxc <= 0xFF else ("u16" if maxc <= 0xFFFF else None)
    out = fetch_rows(mat_dev, nrows, cast=cast, offset=offset, tile=tile)
    import numpy as np

    return out.astype(np.uint32, copy=False)
