"""Candidates for bench.py: B=8192 headline (batch amortization) and
k=21 kmer mode (the 2-word "k2" packed layout)."""
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

from kmtricks_tpu.core.repartition import Repartition
from kmtricks_tpu.parallel.pipeline import build_single_chip_step


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


def make_args(rng, B, L, nsamp, m, nb_parts):
    G = B * L // 10
    genome = rng.choice(np.frombuffer(b"ACGT", dtype=np.uint8), size=G)
    starts = rng.integers(0, G - L, B)
    batch = genome[starts[:, None] + np.arange(L)]
    repart = Repartition.from_xxh(nb_parts, m)
    return (jnp.asarray(np.ascontiguousarray(batch.T)),
            jnp.asarray(np.full(B, L, np.int32)),
            jnp.asarray((np.arange(B, dtype=np.int32) * nsamp) // B),
            jnp.asarray(repart.table.astype(np.int32)),
            jnp.asarray(np.full(nsamp, 2, np.uint32)))


def main():
    rng = np.random.default_rng(42)
    M, NB_PARTS, WINDOW_BITS, NSAMP, L = 10, 64, 250048, 8, 1024

    for B in (8192, 16384):
        args = make_args(rng, B, L, NSAMP, M, NB_PARTS)
        kps = B * (L - 31 + 1)
        s = jax.jit(build_single_chip_step(
            k=31, m=M, nsamp=NSAMP, hard_min=2, rmin=1, save_if=2,
            mode="hash", window_bits=WINDOW_BITS,
            static_repart_parts=NB_PARTS, with_stats=False,
            batch_layout="lb"))
        dt = rate(s, args, iters=8)
        print(f"hash k=31 B={B}: {dt*1e3:8.2f} ms ({kps/dt/1e6:7.1f} M/s)")

    for k in (21, 31):
        B = 4096
        args = make_args(rng, B, L, NSAMP, M, NB_PARTS)
        kps = B * (L - k + 1)
        s = jax.jit(build_single_chip_step(
            k=k, m=M, nsamp=NSAMP, hard_min=2, rmin=1, save_if=2,
            mode="kmer", static_repart_parts=NB_PARTS, with_stats=False,
            batch_layout="lb"))
        dt = rate(s, args, iters=8)
        print(f"kmer k={k} B={B}: {dt*1e3:8.2f} ms ({kps/dt/1e6:7.1f} M/s)")


if __name__ == "__main__":
    main()
