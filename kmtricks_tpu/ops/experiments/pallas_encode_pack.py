"""Fully fused Pallas kernel: transposed read tile -> packed h1 sort words.

The hash-mode hot path is encode -> XXH64 window hash -> single-word
pack -> sort (parallel/pipeline.py). Expressed in jnp, XLA materializes
(L, B)-shaped intermediates (codes, k-mer words, minimizers, validity,
hash pairs) in HBM between fused groups; this kernel keeps one
(L, 128-read) tile VMEM-resident for the whole computation and writes
ONE u32 output — the packed (valid | hash | sample) sort word.

Scope (the production fast path, everything else uses the jnp route):
- transposed (L, B) batches (sequence along sublanes: rolls are cheap);
- k <= 32 (one u64 k-mer word);
- static repartition (partition = XXH64(minimizer) % P — a table gather
  cannot live in the kernel);
- the "h1" packed layout (1 + key_bits + samp_bits <= 32).

Semantics are bit-identical to encode_batch + window_hash + pack_words
(kmer.hpp / Model.hpp / gatb/sorting_count.hpp:347-363 contracts); the
xxh64/u64 algebra is shared with the jnp path (ops/xxh64.py, ops/u64.py
— pure u32 vector ops, traceable inside Mosaic kernels).

Measured outcome (v5e, 8192x1024 reads, within-run): the kernel TIES
the jnp path — 5.81 vs 5.91 ms standalone, full step 23.4 vs 23.7 ms.
On the transposed layout XLA already fuses the whole stage to the same
VPU issue limits; fusing by hand removes HBM traffic that was not the
bottleneck. Kept (bit-exact, tested) as the recorded experiment: Pallas
wins here only where it changes the algorithm (pallas_segscan's O(1)
pass structure, pallas_sort's run merge), not where it replays the jnp
dataflow. The jnp route stays the production path.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from kmtricks_tpu.ops import u64 as U
from kmtricks_tpu.ops.encode import _rev2bit32
from kmtricks_tpu.ops.xxh64 import window_hash, xxh64_u32

I32 = jnp.int32
U32 = jnp.uint32
LANES = 128


def _kernel(batch_ref, len_ref, samp_ref, out_ref, *, k: int, m: int,
            nb_parts: int, window_bits: int, sb: int):
    b = batch_ref[:].astype(I32)                      # (L, LANES)
    L = b.shape[0]
    codes = ((b >> 1) & 3).astype(U32)
    cvalid = ((b == 65) | (b == 67) | (b == 71) | (b == 84)
              | (b == 97) | (b == 99) | (b == 103) | (b == 116))

    def roll0(x, s):
        return pltpu.roll(x, -s % L, axis=0) if s % L else x

    # window validity: sliding-OR of the bad mask over k positions
    # (prefix doubling), and the window inside the read
    bad = (~cvalid).astype(I32)
    c = 1
    y = bad
    while c < k:
        step = min(c, k - c)
        y = y | roll0(y, step)
        c += step
    pos = jax.lax.broadcasted_iota(I32, b.shape, 0)
    valid = (y == 0) & (pos + k <= len_ref[:])

    # forward k-mers rolled in over k static sublane shifts
    hi = jnp.zeros_like(codes)
    lo = jnp.zeros_like(codes)
    for j in range(k):
        hi = (hi << U32(2)) | (lo >> U32(30))
        lo = (lo << U32(2)) | roll0(codes, j)
    # canonical = min(fwd, revcomp)
    rhi = _rev2bit32(lo) ^ U32(0xAAAAAAAA)
    rlo = _rev2bit32(hi) ^ U32(0xAAAAAAAA)
    s = 2 * (32 - k)
    if s:
        if s < 32:
            rlo = (rlo >> U32(s)) | (rhi << U32(32 - s))
            rhi = rhi >> U32(s)
        else:
            rlo = rhi >> U32(s - 32)
            rhi = jnp.zeros_like(rhi)
    take_rc = (rhi < hi) | ((rhi == hi) & (rlo < lo))
    chi = jnp.where(take_rc, rhi, hi)
    clo = jnp.where(take_rc, rlo, lo)

    # masked canonical m-mers -> windowed min (minimizer)
    mv = jnp.zeros_like(codes)
    for j in range(m):
        mv = (mv << U32(2)) | roll0(codes, j)
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
    y2 = masked
    while c < w:
        step = min(c, w - c)
        y2 = jnp.minimum(y2, roll0(y2, step))
        c += step

    # static repartition + counting hash + h1 pack (shared u64 algebra)
    parts = U.mod_const(xxh64_u32(y2.astype(U32)), nb_parts)[1]
    _, wlo = window_hash([(chi, clo)], parts, window_bits)
    word = (wlo << U32(sb)) | samp_ref[:].astype(U32)
    out_ref[:] = jnp.where(valid, word, U32(0xFFFFFFFF))


@partial(jax.jit, static_argnames=("k", "m", "nb_parts", "window_bits",
                                   "sb", "interpret"))
def encode_pack_h1_pallas(batchT, lengths, samp, k: int, m: int,
                          nb_parts: int, window_bits: int, sb: int,
                          interpret: bool = False):
    """(L, B) u8 transposed reads -> (L * B,) packed h1 sort words.

    B must be a multiple of 128 (lane tile). Positions past a read's
    last window (or containing non-ACGT) are the all-ones sentinel —
    exactly pack_words("h1", ...) of the jnp encode outputs."""
    L, B = batchT.shape
    assert B % LANES == 0, "pad the batch to a multiple of 128 reads"
    assert k <= 32 and 1 + (window_bits * nb_parts - 1).bit_length() \
        + sb <= 32
    grid = (B // LANES,)
    col = lambda i: (0, i)
    out = pl.pallas_call(
        partial(_kernel, k=k, m=m, nb_parts=nb_parts,
                window_bits=window_bits, sb=sb),
        grid=grid,
        in_specs=[pl.BlockSpec((L, LANES), col, memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, LANES), col, memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, LANES), col, memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((L, LANES), col, memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((L, B), jnp.uint32),
        interpret=interpret,
    )(batchT, lengths.reshape(1, B).astype(I32),
      samp.reshape(1, B).astype(I32))
    # rows past the last window position are all-sentinel — slice to the
    # (W, B) window shape so N and the flat order match the jnp path
    return out[:L - k + 1].reshape(-1)
