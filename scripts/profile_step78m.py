"""Isolate the 78M-window step cost: encode+sort+segment vs router vs
compaction scatters, on the real chip."""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import jax

jax.config.update("jax_compilation_cache_dir", os.path.abspath(
    os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                 ".jax_cache")))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

import jax.numpy as jnp

from kmtricks_tpu.core.repartition import Repartition
from kmtricks_tpu.parallel.pipeline import (build_sharded_pipeline,
                                            build_single_chip_step,
                                            make_mesh)

K, M, NB_PARTS, NSAMP = 31, 10, 64, 10
B, L = 78120, 1024
rng = np.random.default_rng(42)


def fetch_small(out):
    return np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[:8])


def rate(label, fn, args, iters=3):
    fetch_small(fn(*args))
    t0 = time.perf_counter()
    out = None
    for _ in range(iters):
        out = fn(*args)
    fetch_small(out)
    dt = (time.perf_counter() - t0) / iters
    print(f"{label}: {dt*1e3:.0f} ms", flush=True)
    return dt


def main():
    G = B * L // 10
    genome = rng.choice(np.frombuffer(b"ACGT", dtype=np.uint8), size=G)
    starts = rng.integers(0, G - L, B)
    b = genome[starts[:, None] + np.arange(L)]
    samp = (np.arange(B, dtype=np.int32) * NSAMP) // B
    repart = Repartition.from_xxh(NB_PARTS, M)
    amin = np.full(NSAMP, 2, np.uint32)
    args = (jnp.asarray(np.ascontiguousarray(b.T)),
            jnp.asarray(np.full(B, L, np.int32)), jnp.asarray(samp),
            jnp.asarray(repart.table.astype(np.int32)), jnp.asarray(amin))
    jax.block_until_ready(args[0])
    N = B * (L - K + 1)
    print(f"windows {N/1e6:.1f}M")

    # 1. single-chip fused step, no compaction, no router
    s1 = jax.jit(build_single_chip_step(
        k=K, m=M, nsamp=NSAMP, hard_min=2, rmin=1, save_if=0, mode="kmer",
        static_repart_parts=NB_PARTS, with_stats=False, batch_layout="lb"))
    rate("single-chip step (no compact)", s1, args)

    # 2. + compaction
    s2 = jax.jit(build_single_chip_step(
        k=K, m=M, nsamp=NSAMP, hard_min=2, rmin=1, save_if=0, mode="kmer",
        static_repart_parts=NB_PARTS, with_stats=False, batch_layout="lb",
        compact_rows=1 << 21))
    rate("single-chip step + compact(2M)", s2, args)
    s2b = jax.jit(build_single_chip_step(
        k=K, m=M, nsamp=NSAMP, hard_min=2, rmin=1, save_if=0, mode="kmer",
        static_repart_parts=NB_PARTS, with_stats=False, batch_layout="lb",
        compact_rows=1 << 24))
    rate("single-chip step + compact(16M)", s2b, args)

    # 3. mesh step (router included), compaction
    mesh = make_mesh(1)
    s3 = build_sharded_pipeline(
        mesh, k=K, m=M, nb_parts=NB_PARTS, cap=N, nsamp=NSAMP, hard_min=2,
        rmin=1, save_if=0, mode="kmer", static_repart=True,
        with_stats=False, batch_layout="lb", compact_rows=1 << 21)
    rate("mesh step + router + compact(2M)", s3, args)

    # 4. mesh step without compaction
    s4 = build_sharded_pipeline(
        mesh, k=K, m=M, nb_parts=NB_PARTS, cap=N, nsamp=NSAMP, hard_min=2,
        rmin=1, save_if=0, mode="kmer", static_repart=True,
        with_stats=False, batch_layout="lb")
    rate("mesh step + router (no compact)", s4, args)

    # 5. isolated scatters at this scale
    n = N
    idx = jnp.asarray(rng.integers(0, 1 << 21, n, dtype=np.int32))
    val = jnp.asarray(rng.integers(0, 255, n, dtype=np.uint32))

    @jax.jit
    def scat1(idx, val):
        return jnp.zeros((1 << 21) * 10, dtype=jnp.uint32).at[idx].set(val)

    rate("1D scatter 77.7M -> 21M slots", scat1, (idx, val))

    @jax.jit
    def scat_rows(idx, val):
        payload = jnp.stack([val, val, val, val], axis=1)
        return jnp.zeros((1 << 21, 4), dtype=jnp.uint32).at[
            idx, :].set(payload)

    rate("row scatter 77.7M x 4 cols", scat_rows, (idx, val))


if __name__ == "__main__":
    main()
