"""Sweep pallas encode tile heights to separate grid overhead from roll
cost (encode jnp = 4.95 ms; pallas at tile_rows=8 = 32.5 ms)."""
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
    from kmtricks_tpu.core.repartition import Repartition
    from kmtricks_tpu.ops.experiments.pallas_encode import encode_batch_pallas

    K, M, NB_PARTS, L, B = 31, 10, 64, 1024, 4096
    repart = Repartition.from_xxh(NB_PARTS, M)
    G = B * L // 10
    genome = rng.choice(np.frombuffer(b"ACGT", dtype=np.uint8), size=G)
    starts = rng.integers(0, G - L, B)
    batch = genome[starts[:, None] + np.arange(L)]
    lengths = np.full(B, L, dtype=np.int32)
    args = (jnp.asarray(batch), jnp.asarray(lengths),
            jnp.asarray(repart.table.astype(np.int32)))

    for tr in (32, 128, 512):
        ep = jax.jit(partial(encode_batch_pallas, k=K, m=M, tile_rows=tr))
        dt = rate(ep, args)
        print(f"encode pallas tile_rows={tr:4d}: {dt*1e3:8.2f} ms")


if __name__ == "__main__":
    main()
