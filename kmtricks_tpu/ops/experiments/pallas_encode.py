"""Pallas TPU kernel: fused read encoding.

The encode stage (ASCII -> 2-bit codes -> rolling canonical k-mers ->
masked m-mer minimizers) is a ~k-step rolling computation; expressed in
plain jnp, XLA materializes large intermediates in HBM between steps. This
kernel keeps one (8, L) read tile resident in VMEM for the whole roll —
every shift is a ``pltpu.roll`` on VMEM data — so HBM sees only the input
tile once and the four output tiles once.

Semantics identical to :func:`kmtricks_tpu.ops.encode.encode_batch`
(same reference contract, kmer.hpp / Model.hpp): windows are full-width L
with positions >= W masked invalid, so all rolls may wrap harmlessly.

Status: recorded experiment, not the production path. On (B, L) tiles
the lane-axis rolls dominate and the kernel only ties the jnp encode;
production moved to the transposed (L, B) layout (encode.py seq_axis=0),
where the fully fused variant (pallas_encode_pack.py) ALSO ties — XLA's
fusion on this dataflow is already at VPU issue limits. See NOTES.md.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

I32 = jnp.int32
U32 = jnp.uint32

TILE_ROWS = 8


from kmtricks_tpu.ops.encode import _rev2bit32  # noqa: E402


def _kernel(batch_ref, len_ref, hi_ref, lo_ref, minim_ref, valid_ref,
            *, k: int, m: int):
    b = batch_ref[:].astype(I32)                      # (TILE, L)
    L = b.shape[1]
    codes = ((b >> 1) & 3).astype(U32)
    cvalid = ((b == 65) | (b == 67) | (b == 71) | (b == 84)
              | (b == 97) | (b == 99) | (b == 103) | (b == 116))

    def rollc(x, s):
        return pltpu.roll(x, -s % L, axis=1) if s % L else x

    # window validity: no invalid char among the k (sliding-OR of the bad
    # mask by prefix doubling — cumsum is unsupported in Pallas TPU and
    # rotates need 32-bit lanes), and the window inside the read
    bad = (~cvalid).astype(I32)
    c = 1
    y = bad
    while c < k:
        step = min(c, k - c)
        y = y | rollc(y, step)
        c += step
    pos = jax.lax.broadcasted_iota(I32, b.shape, 1)
    inside = pos + k <= len_ref[:]
    valid = (y == 0) & inside

    # forward k-mers, rolled in over k static shifts (VMEM-resident)
    hi = jnp.zeros_like(codes)
    lo = jnp.zeros_like(codes)
    for j in range(k):
        hi = (hi << U32(2)) | (lo >> U32(30))
        lo = (lo << U32(2)) | rollc(codes, j)
    # canonical = min(fwd, revcomp)
    rhi = _rev2bit32(lo) ^ U32(0xAAAAAAAA)
    rlo = _rev2bit32(hi) ^ U32(0xAAAAAAAA)
    s = 2 * (32 - k)
    if s:  # shr64 by s (s < 32 since k > 16; handle k <= 16 too)
        if s < 32:
            rlo = (rlo >> U32(s)) | (rhi << U32(32 - s))
            rhi = rhi >> U32(s)
        else:
            rlo = rhi >> U32(s - 32)
            rhi = jnp.zeros_like(rhi)
    take_rc = (rhi < hi) | ((rhi == hi) & (rlo < lo))
    chi = jnp.where(take_rc, rhi, hi)
    clo = jnp.where(take_rc, rlo, lo)

    # masked canonical m-mers -> windowed min over k - m + 1 positions.
    # m-mer values < 2^(2m) <= 2^30 fit int32; Mosaic has no unsigned min.
    mv = jnp.zeros_like(codes)
    for j in range(m):
        mv = (mv << U32(2)) | rollc(codes, j)
    rc = (_rev2bit32(mv) ^ U32(0xAAAAAAAA)) >> U32(32 - 2 * m)
    mc = jnp.minimum(mv.astype(I32), rc.astype(I32))
    if m >= 3:
        mask1 = (1 << (2 * m - 4)) - 1
        mask00 = 0x55555555 & mask1
        a = ~(mc | (mc >> 2))
        allowed = (((a >> 1) & a) & mask00) == 0
    else:
        allowed = jnp.ones_like(mc, dtype=bool)
    sentinel = (1 << (2 * m)) - 1
    masked = jnp.where(allowed, mc, sentinel)
    w = k - m + 1
    c = 1
    y = masked
    while c < w:
        step = min(c, w - c)
        y = jnp.minimum(y, rollc(y, step))
        c += step

    hi_ref[:] = chi
    lo_ref[:] = clo
    minim_ref[:] = y.astype(I32)
    valid_ref[:] = valid.astype(I32)


@partial(jax.jit, static_argnames=("k", "m", "interpret", "tile_rows"))
def encode_batch_pallas(batch, lengths, repart_table, k: int, m: int,
                        interpret: bool = False,
                        tile_rows: int = TILE_ROWS):
    """Pallas twin of encode_batch: (B, L) u8 reads -> canonical k-mers,
    partitions, validity. B must be a multiple of tile_rows; W = L - k + 1."""
    B, L = batch.shape
    assert B % tile_rows == 0, "pad the batch to a multiple of tile_rows"
    W = L - k + 1
    grid = (B // tile_rows,)
    row_spec = pl.BlockSpec((tile_rows, L), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    out_specs = [pl.BlockSpec((tile_rows, L), lambda i: (i, 0),
                              memory_space=pltpu.VMEM)] * 4
    hi, lo, minim, valid = pl.pallas_call(
        partial(_kernel, k=k, m=m),
        grid=grid,
        in_specs=[row_spec,
                  pl.BlockSpec((tile_rows, 1), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=out_specs,
        out_shape=[
            jax.ShapeDtypeStruct((B, L), jnp.uint32),
            jax.ShapeDtypeStruct((B, L), jnp.uint32),
            jax.ShapeDtypeStruct((B, L), jnp.int32),
            jax.ShapeDtypeStruct((B, L), jnp.int32),
        ],
        interpret=interpret,
    )(batch, lengths.reshape(B, 1).astype(I32))
    minim = minim[:, :W]
    parts = repart_table[minim]
    return (hi[:, :W], lo[:, :W], parts.astype(I32),
            valid[:, :W].astype(bool))
