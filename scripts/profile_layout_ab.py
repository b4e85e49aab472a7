"""Within-run A/B: production hash-mode step, (B,L) vs (L,B) batch."""
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


def main():
    rng = np.random.default_rng(42)
    K, M, NB_PARTS, WINDOW_BITS, NSAMP, B, L = 31, 10, 64, 250048, 8, 4096, 1024
    G = B * L // 10
    genome = rng.choice(np.frombuffer(b"ACGT", dtype=np.uint8), size=G)
    starts = rng.integers(0, G - L, B)
    batch = genome[starts[:, None] + np.arange(L)]
    lengths = np.full(B, L, dtype=np.int32)
    samp = (np.arange(B, dtype=np.int32) * NSAMP) // B
    repart = Repartition.from_xxh(NB_PARTS, M)
    amin = np.full(NSAMP, 2, dtype=np.uint32)
    kps = B * (L - K + 1)

    common = (jnp.asarray(lengths), jnp.asarray(samp),
              jnp.asarray(repart.table.astype(np.int32)), jnp.asarray(amin))
    kw = dict(k=K, m=M, nsamp=NSAMP, hard_min=2, rmin=1, save_if=2,
              mode="hash", window_bits=WINDOW_BITS,
              static_repart_parts=NB_PARTS, with_stats=False)
    s_bl = jax.jit(build_single_chip_step(**kw))
    s_lb = jax.jit(build_single_chip_step(batch_layout="lb", **kw))
    a_bl = (jnp.asarray(batch),) + common
    a_lb = (jnp.asarray(np.ascontiguousarray(batch.T)),) + common
    for name, s, a in (("bl", s_bl, a_bl), ("lb", s_lb, a_lb),
                       ("bl2", s_bl, a_bl), ("lb2", s_lb, a_lb)):
        dt = rate(s, a)
        print(f"step {name}: {dt*1e3:8.2f} ms ({kps/dt/1e6:7.1f} M kmers/s)")

    km = dict(k=K, m=M, nsamp=NSAMP, hard_min=2, rmin=1, save_if=2,
              mode="kmer", static_repart_parts=NB_PARTS, with_stats=False)
    k_bl = jax.jit(build_single_chip_step(**km))
    k_lb = jax.jit(build_single_chip_step(batch_layout="lb", **km))
    for name, s, a in (("kmer bl", k_bl, a_bl), ("kmer lb", k_lb, a_lb)):
        dt = rate(s, a)
        print(f"step {name}: {dt*1e3:8.2f} ms ({kps/dt/1e6:7.1f} M kmers/s)")


if __name__ == "__main__":
    main()
