"""Measure lax.sort scaling and full-step throughput vs batch size.

The round-2 step is sort-dominated (1-op u32 sort = 9.6 ms of the
12.6 ms step at N = 4.19M). NOTES says the sort is "mostly fixed cost,
not bandwidth" — if so, bigger batches amortize it. This script
measures both on the real chip.
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import jax

cache = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     "..", ".jax_cache")
jax.config.update("jax_compilation_cache_dir", os.path.abspath(cache))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

import jax.numpy as jnp


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

    # --- stage breakdown of the headline hash-mode step at B=4096
    from functools import partial

    from kmtricks_tpu.core.repartition import Repartition
    from kmtricks_tpu.ops.count_merge import pack_words, packed_layout
    from kmtricks_tpu.parallel.pipeline import (_encode_flat,
                                                build_single_chip_step)

    K, M, NB_PARTS, WINDOW_BITS, NSAMP, L = 31, 10, 64, 250048, 8, 1024
    B = 4096
    repart = Repartition.from_xxh(NB_PARTS, M)
    G = B * L // 10
    genome = rng.choice(np.frombuffer(b"ACGT", dtype=np.uint8), size=G)
    starts = rng.integers(0, G - L, B)
    batch = genome[starts[:, None] + np.arange(L)]
    lengths = np.full(B, L, dtype=np.int32)
    samp = (np.arange(B, dtype=np.int32) * NSAMP) // B
    amin = np.full(NSAMP, 2, dtype=np.uint32)
    args = (jnp.asarray(batch), jnp.asarray(lengths), jnp.asarray(samp),
            jnp.asarray(repart.table.astype(np.int32)), jnp.asarray(amin))
    kps = B * (L - K + 1)

    enc = jax.jit(partial(_encode_flat, k=K, m=M, mode="hash",
                          window_bits=WINDOW_BITS, static_parts=NB_PARTS))
    dt = rate(enc, args[:4])
    print(f"encode+hash:      {dt*1e3:8.2f} ms")

    key_bits = (WINDOW_BITS * NB_PARTS - 1).bit_length()
    layout = packed_layout(NSAMP, 2, True, key_bits)

    def enc_pack(batch, lengths, samp, table):
        keys, sampw, parts, valid = _encode_flat(
            batch, lengths, samp, table, K, M, "hash", WINDOW_BITS,
            "auto", NB_PARTS)
        return pack_words(layout, parts, keys, sampw, valid, NSAMP)

    ep = jax.jit(enc_pack)
    dt = rate(ep, args[:4])
    print(f"encode+hash+pack: {dt*1e3:8.2f} ms")

    words = tuple(np.asarray(w) for w in ep(*args[:4]))
    jw = tuple(jnp.asarray(w) for w in words)
    srt = jax.jit(lambda *ws: jax.lax.sort(ws, num_keys=len(ws)))
    dt = rate(srt, jw)
    print(f"sort({len(jw)}op):        {dt*1e3:8.2f} ms")

    step = jax.jit(build_single_chip_step(
        k=K, m=M, nsamp=NSAMP, hard_min=2, rmin=1, save_if=2,
        mode="hash", window_bits=WINDOW_BITS,
        static_repart_parts=NB_PARTS, with_stats=False))
    dt = rate(step, args, iters=8)
    print(f"full step:        {dt*1e3:8.2f} ms ({kps/dt/1e6:7.1f} M kmers/s)")

    # --- same at B=8192 (sort throughput rises slightly with n)
    B2 = 8192
    G = B2 * L // 10
    genome = rng.choice(np.frombuffer(b"ACGT", dtype=np.uint8), size=G)
    starts = rng.integers(0, G - L, B2)
    batch2 = genome[starts[:, None] + np.arange(L)]
    args2 = (jnp.asarray(batch2),
             jnp.asarray(np.full(B2, L, dtype=np.int32)),
             jnp.asarray((np.arange(B2, dtype=np.int32) * NSAMP) // B2),
             jnp.asarray(repart.table.astype(np.int32)), jnp.asarray(amin))
    dt = rate(step, args2, iters=8)
    print(f"step B=8192:      {dt*1e3:8.2f} ms "
          f"({B2*(L-K+1)/dt/1e6:7.1f} M kmers/s)")


if __name__ == "__main__":
    main()
