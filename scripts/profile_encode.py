"""Split the encode+hash 5.3 ms: jnp encode vs Pallas encode vs xxh64."""
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
    from kmtricks_tpu.ops.encode import encode_batch
    from kmtricks_tpu.ops.experiments.pallas_encode import encode_batch_pallas
    from kmtricks_tpu.ops.u64 import msb_words_to_u64_pairs
    from kmtricks_tpu.ops.xxh64 import window_hash

    K, M, NB_PARTS, WINDOW_BITS, L, B = 31, 10, 64, 250048, 1024, 4096
    repart = Repartition.from_xxh(NB_PARTS, M)
    G = B * L // 10
    genome = rng.choice(np.frombuffer(b"ACGT", dtype=np.uint8), size=G)
    starts = rng.integers(0, G - L, B)
    batch = genome[starts[:, None] + np.arange(L)]
    lengths = np.full(B, L, dtype=np.int32)
    args = (jnp.asarray(batch), jnp.asarray(lengths),
            jnp.asarray(repart.table.astype(np.int32)))

    ej = jax.jit(partial(encode_batch, k=K, m=M, static_parts=NB_PARTS))
    dt = rate(ej, args)
    print(f"encode jnp:            {dt*1e3:8.2f} ms")

    ep = jax.jit(partial(encode_batch_pallas, k=K, m=M))
    dt = rate(ep, args)
    print(f"encode pallas:         {dt*1e3:8.2f} ms")

    hi, lo, parts, valid = [np.asarray(x) for x in ej(*args)]
    jhi, jlo = jnp.asarray(hi.ravel()), jnp.asarray(lo.ravel())
    jparts = jnp.asarray(parts.ravel())

    def hsh(h, l, p):
        return window_hash(msb_words_to_u64_pairs((h, l)), p, WINDOW_BITS)

    hj = jax.jit(hsh)
    dt = rate(hj, (jhi, jlo, jparts))
    print(f"xxh64 window_hash:     {dt*1e3:8.2f} ms")


if __name__ == "__main__":
    main()
