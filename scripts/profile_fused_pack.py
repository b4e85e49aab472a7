"""On-chip parity + timing: fused Pallas encode->hash->pack kernel vs the
jnp encode+hash+pack stage, and the full step built on it."""
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

from kmtricks_tpu.ops.count_merge import (count_merge_packed, pack_words,
                                          packed_layout)
from kmtricks_tpu.ops.experiments.pallas_encode_pack import encode_pack_h1_pallas
from kmtricks_tpu.parallel.pipeline import _encode_flat


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
    rng = np.random.default_rng(42)
    K, M, NB_PARTS, WINDOW_BITS, NSAMP, B, L = 31, 10, 64, 250048, 8, 8192, 1024
    SB = max(1, (NSAMP - 1).bit_length())
    G = B * L // 10
    genome = rng.choice(np.frombuffer(b"ACGT", dtype=np.uint8), size=G)
    starts = rng.integers(0, G - L, B)
    batch = genome[starts[:, None] + np.arange(L)]
    lengths = np.full(B, L, np.int32)
    samp = (np.arange(B, dtype=np.int32) * NSAMP) // B
    bt = jnp.asarray(np.ascontiguousarray(batch.T))
    jl, js = jnp.asarray(lengths), jnp.asarray(samp)
    table = jnp.asarray(np.zeros(4 ** M, np.int32))

    def jnp_pack(bt, jl, js, table):
        keys, sampw, parts, valid = _encode_flat(
            bt, jl, js, table, K, M, "hash", WINDOW_BITS, "auto",
            NB_PARTS, "lb")
        return pack_words("h1", parts, keys, sampw, valid, NSAMP)

    jp = jax.jit(jnp_pack)
    fused = jax.jit(partial(encode_pack_h1_pallas, k=K, m=M,
                            nb_parts=NB_PARTS, window_bits=WINDOW_BITS,
                            sb=SB))

    (ref,) = jp(bt, jl, js, table)
    got = fused(bt, jl, js)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))
    print("on-chip fused parity OK")

    dt = rate(jp, (bt, jl, js, table))
    print(f"jnp encode+hash+pack:  {dt*1e3:8.2f} ms")
    dt = rate(fused, (bt, jl, js))
    print(f"fused Pallas kernel:   {dt*1e3:8.2f} ms")

    # full step on each
    amin = jnp.asarray(np.full(NSAMP, 2, np.uint32))
    key_bits = (WINDOW_BITS * NB_PARTS - 1).bit_length()

    def step_jnp(bt, jl, js, table, amin):
        words = jnp_pack(bt, jl, js, table)
        return count_merge_packed(
            words, amin, layout="h1", nsamp=NSAMP, hard_min=2, rmin=1,
            save_if=2, with_stats=False, key_bits=key_bits,
            window_bits=WINDOW_BITS)

    def step_fused(bt, jl, js, table, amin):
        words = (fused(bt, jl, js),)
        return count_merge_packed(
            words, amin, layout="h1", nsamp=NSAMP, hard_min=2, rmin=1,
            save_if=2, with_stats=False, key_bits=key_bits,
            window_bits=WINDOW_BITS)

    kps = B * (L - K + 1)
    for name, st in (("step jnp  ", jax.jit(step_jnp)),
                     ("step fused", jax.jit(step_fused))):
        dt = rate(st, (bt, jl, js, table, amin), iters=8)
        print(f"{name}: {dt*1e3:8.2f} ms ({kps/dt/1e6:7.1f} M kmers/s)")


if __name__ == "__main__":
    main()
