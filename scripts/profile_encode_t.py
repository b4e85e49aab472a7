"""Transposed-layout encode experiment: sequence along axis 0 (sublanes).

Compares the production (B, L) jnp encode against an (L, B) variant where
the k rolling steps slice along axis 0 — on TPU, lane-axis shifts are the
expensive permutes; sublane shifts are cheap. Also measures a stripped
kmer-roll-only core to see where the 4.95 ms goes.
"""
import os
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import jax

cache = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     "..", ".jax_cache")
jax.config.update("jax_compilation_cache_dir", os.path.abspath(cache))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

import jax.numpy as jnp

from kmtricks_tpu.ops import u64 as U
from kmtricks_tpu.ops.encode import (ascii_to_codes, canonical64,
                                     encode_batch, mmer_allowed,
                                     mmer_canonical, sliding_min)
from kmtricks_tpu.ops.xxh64 import static_partitions, window_hash

U32 = jnp.uint32


def fetch(out):
    return np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[:8])


def rate(step, args, iters=10):
    fetch(step(*args))
    fetch(step(*args))
    t0 = time.perf_counter()
    out = None
    for _ in range(iters):
        out = step(*args)
    fetch(out)
    return (time.perf_counter() - t0) / iters


@partial(jax.jit, static_argnames=("k", "m", "static_parts"))
def encode_batch_T(batchT, lengths, k: int, m: int, static_parts: int):
    """(L, B) transposed encode twin (slices along axis 0)."""
    L, B = batchT.shape
    W = L - k + 1
    Wm = L - m + 1
    codes, char_valid = ascii_to_codes(batchT)

    bad = (~char_valid).astype(jnp.int32)
    cs = jnp.cumsum(bad, axis=0)
    csz = jnp.pad(cs, ((1, 0), (0, 0)))
    win_clean = (csz[k:] - csz[:-k]) == 0
    pos = jax.lax.broadcasted_iota(jnp.int32, (W, B), 0)
    inside = pos + k <= lengths[None, :]
    valid = win_clean & inside

    hi = jnp.zeros((W, B), dtype=U32)
    lo = jnp.zeros((W, B), dtype=U32)
    for j in range(k):
        hi, lo = U.shl64((hi, lo), 2)
        lo = lo | jax.lax.dynamic_slice_in_dim(codes, j, W, axis=0)
    cano, _ = canonical64((hi, lo), k)

    mv = jnp.zeros((Wm, B), dtype=U32)
    for j in range(m):
        mv = (mv << U32(2)) | jax.lax.dynamic_slice_in_dim(codes, j, Wm,
                                                           axis=0)
    mc = mmer_canonical(mv, m)
    sentinel = U32((1 << (2 * m)) - 1)
    masked = jnp.where(mmer_allowed(mc, m), mc, sentinel)
    # windowed min along axis 0
    c = 1
    y = masked
    while c < k - m + 1:
        s = min(c, k - m + 1 - c)
        y = jnp.minimum(y[: y.shape[0] - s], y[s:])
        c += s
    parts = static_partitions(y, static_parts)
    return cano[0], cano[1], parts.astype(jnp.int32), valid


@partial(jax.jit, static_argnames=("k",))
def kmer_roll_only(batch, k: int):
    codes, _ = ascii_to_codes(batch)
    B, L = batch.shape
    W = L - k + 1
    hi = jnp.zeros((B, W), dtype=U32)
    lo = jnp.zeros((B, W), dtype=U32)
    for j in range(k):
        hi, lo = U.shl64((hi, lo), 2)
        lo = lo | jax.lax.dynamic_slice_in_dim(codes, j, W, axis=1)
    return hi, lo


def main():
    rng = np.random.default_rng(0)
    K, M, NB_PARTS, L, B = 31, 10, 64, 1024, 4096
    G = B * L // 10
    genome = rng.choice(np.frombuffer(b"ACGT", dtype=np.uint8), size=G)
    starts = rng.integers(0, G - L, B)
    batch = genome[starts[:, None] + np.arange(L)]
    lengths = np.full(B, L, dtype=np.int32)
    jb = jnp.asarray(batch)
    jbT = jnp.asarray(np.ascontiguousarray(batch.T))
    jl = jnp.asarray(lengths)

    ej = jax.jit(partial(encode_batch, k=K, m=M, static_parts=NB_PARTS))
    table = jnp.zeros(4**M, jnp.int32)
    dt = rate(ej, (jb, jl, table))
    print(f"encode (B,L):        {dt*1e3:8.2f} ms")

    eT = partial(encode_batch_T, k=K, m=M, static_parts=NB_PARTS)
    dt = rate(eT, (jbT, jl))
    print(f"encode (L,B):        {dt*1e3:8.2f} ms")

    # numerics parity
    h1, l1, p1, v1 = [np.asarray(x) for x in ej(jb, jl, table)]
    h2, l2, p2, v2 = [np.asarray(x) for x in eT(jbT, jl)]
    assert np.array_equal(h1, h2.T) and np.array_equal(l1, l2.T)
    assert np.array_equal(p1, p2.T) and np.array_equal(v1, v2.T)
    print("parity OK")

    kr = partial(kmer_roll_only, k=K)
    dt = rate(kr, (jb,))
    print(f"kmer roll only(B,L): {dt*1e3:8.2f} ms")


if __name__ == "__main__":
    main()
