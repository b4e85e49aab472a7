"""Log-doubling k-mer roll prototype: build width-2^j windows by
combining, then assemble k from its binary digits — O(log k) vector
passes instead of k. Measured standalone and inside a full transposed
encode, against the production encode."""
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
                                     mmer_canonical)
from kmtricks_tpu.ops.xxh64 import static_partitions

U32 = jnp.uint32


def _sl(x, off, n, axis):
    return jax.lax.dynamic_slice_in_dim(x, off, n, axis=axis)


def roll_kmer_doubling(codes, k: int, axis: int):
    """Packed width-k 2-bit windows of ``codes`` along ``axis`` as
    (hi, lo) u32 pairs, via window doubling + binary-digit assembly."""
    L = codes.shape[axis]
    pw = {1: (jnp.zeros_like(codes), codes)}
    c = 1
    while c * 2 <= k:
        h, l = pw[c]
        n = L - 2 * c + 1
        a = (_sl(h, 0, n, axis), _sl(l, 0, n, axis))
        b = (_sl(h, c, n, axis), _sl(l, c, n, axis))
        hi2, lo2 = U.shl64(a, 2 * c)
        pw[2 * c] = (hi2 | b[0], lo2 | b[1])
        c *= 2
    W = L - k + 1
    acc = None
    pos = 0
    for c in sorted(pw, reverse=True):
        if not (k & c):
            continue
        h, l = pw[c]
        piece = (_sl(h, pos, W, axis), _sl(l, pos, W, axis))
        if acc is None:
            acc = piece
        else:
            hi2, lo2 = U.shl64(acc, 2 * c)
            acc = (hi2 | piece[0], lo2 | piece[1])
        pos += c
    return acc


def roll_mmer_doubling(codes, m: int, axis: int):
    """Single-u32 width-m windows (m <= 15)."""
    L = codes.shape[axis]
    pw = {1: codes}
    c = 1
    while c * 2 <= m:
        v = pw[c]
        n = L - 2 * c + 1
        pw[2 * c] = (_sl(v, 0, n, axis) << U32(2 * c)) | _sl(v, c, n, axis)
        c *= 2
    W = L - m + 1
    acc = None
    pos = 0
    for c in sorted(pw, reverse=True):
        if not (m & c):
            continue
        piece = _sl(pw[c], pos, W, axis)
        acc = piece if acc is None else (acc << U32(2 * c)) | piece
        pos += c
    return acc


def sliding_min_ax(x, w: int, axis: int):
    c = 1
    y = x
    while c < w:
        s = min(c, w - c)
        n = y.shape[axis] - s
        y = jnp.minimum(_sl(y, 0, n, axis), _sl(y, s, n, axis))
        c += s
    return y


@partial(jax.jit, static_argnames=("k", "m", "static_parts", "axis"))
def encode_dbl(batch, lengths, k: int, m: int, static_parts: int,
               axis: int):
    """Full encode with doubling rolls; axis = sequence axis (1 for (B,L)
    input, 0 for (L,B))."""
    codes, char_valid = ascii_to_codes(batch)
    L = batch.shape[axis]
    W = L - k + 1

    bad = (~char_valid).astype(jnp.int32)
    cs = jnp.cumsum(bad, axis=axis)
    pad = [(0, 0), (0, 0)]
    pad[axis] = (1, 0)
    csz = jnp.pad(cs, pad)
    win_clean = (_sl(csz, k, W, axis) - _sl(csz, 0, W, axis)) == 0
    pos = jax.lax.broadcasted_iota(jnp.int32, win_clean.shape, axis)
    lb = lengths[:, None] if axis == 1 else lengths[None, :]
    valid = win_clean & (pos + k <= lb)

    cano, _ = canonical64(roll_kmer_doubling(codes, k, axis), k)

    mc = mmer_canonical(roll_mmer_doubling(codes, m, axis), m)
    sentinel = U32((1 << (2 * m)) - 1)
    masked = jnp.where(mmer_allowed(mc, m), mc, sentinel)
    minim = sliding_min_ax(masked, k - m + 1, axis)
    parts = static_partitions(minim, static_parts)
    return cano[0], cano[1], parts.astype(jnp.int32), valid


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
    table = jnp.zeros(4**M, jnp.int32)

    ej = jax.jit(partial(encode_batch, k=K, m=M, static_parts=NB_PARTS))
    h1, l1, p1, v1 = [np.asarray(x) for x in ej(jb, jl, table)]

    eD = partial(encode_dbl, k=K, m=M, static_parts=NB_PARTS, axis=1)
    h2, l2, p2, v2 = [np.asarray(x) for x in eD(jb, jl)]
    assert np.array_equal(h1, h2) and np.array_equal(l1, l2)
    assert np.array_equal(p1, p2) and np.array_equal(v1, v2)
    print("parity OK (B,L)")

    eDT = partial(encode_dbl, k=K, m=M, static_parts=NB_PARTS, axis=0)
    h3, l3, p3, v3 = [np.asarray(x) for x in eDT(jbT, jl)]
    assert np.array_equal(h1, h3.T) and np.array_equal(l1, l3.T)
    assert np.array_equal(p1, p3.T) and np.array_equal(v1, v3.T)
    print("parity OK (L,B)")

    dt = rate(ej, (jb, jl, table))
    print(f"encode prod (B,L):      {dt*1e3:8.2f} ms")
    dt = rate(eD, (jb, jl))
    print(f"encode dbl  (B,L):      {dt*1e3:8.2f} ms")
    dt = rate(eDT, (jbT, jl))
    print(f"encode dbl  (L,B):      {dt*1e3:8.2f} ms")


if __name__ == "__main__":
    main()
