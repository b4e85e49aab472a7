"""Hierarchical sort candidate: lax.sort over (R, N/R) rows (dimension=1)
then log2(R) Pallas merge levels, vs the 1D lax.sort it would replace.
Question: how does the XLA row-sort cost scale with few-long-rows shapes?"""
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

from kmtricks_tpu.ops.pallas_sort import merge_sorted_runs_u32


def fetch(out):
    return np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[:8])


def rate(step, args, iters=8):
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
    N = 8 * 1024 * 1024
    x = rng.integers(0, 1 << 32, N, dtype=np.uint64).astype(np.uint32)

    jx = jnp.asarray(x)
    srt = jax.jit(lambda v: jax.lax.sort((v,), dimension=0, num_keys=1)[0])
    dt = rate(srt, (jx,))
    print(f"1D sort {N/1e6:.2f}M:          {dt*1e3:8.2f} ms")

    for R in (2, 4, 8, 16, 64):
        jr = jnp.asarray(x.reshape(R, N // R))
        rs = jax.jit(lambda v: jax.lax.sort((v,), dimension=1, num_keys=1)[0])
        dt = rate(rs, (jr,))
        print(f"row sort ({R:3d},{N//R//1024}k):     {dt*1e3:8.2f} ms")

    # full hierarchical: row-sort + merge levels (merge_sorted_runs_u32
    # takes (R, cap) sorted rows)
    for R in (2, 4, 8):
        jr = jnp.asarray(x.reshape(R, N // R))

        def hier(v):
            rows = jax.lax.sort((v,), dimension=1, num_keys=1)[0]
            return merge_sorted_runs_u32(rows)

        f = jax.jit(hier)
        dt = rate(f, (jr,))
        got = np.asarray(f(jr))
        np.testing.assert_array_equal(got, np.sort(x))
        print(f"hier sort R={R}:           {dt*1e3:8.2f} ms (parity OK)")


if __name__ == "__main__":
    main()
