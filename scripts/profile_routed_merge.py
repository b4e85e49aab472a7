"""On-chip validation + timing of the mesh receiver paths:
(a) merge_sorted_runs_u32 (8 runs) vs lax.sort at mesh-like sizes,
(b) the 1-device mesh step (now skips the receiver re-sort entirely)."""
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
from kmtricks_tpu.ops.pallas_sort import (merge_sorted_runs_u32,
                                          merge_sorted_runs_words)
from kmtricks_tpu.parallel.pipeline import (build_sharded_pipeline,
                                            make_mesh)


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
    NRUNS, CAP = 8, 512 * 1024            # 4.19M total, the bench shape
    x = np.full((NRUNS, CAP), 0xFFFFFFFF, dtype=np.uint32)
    for i in range(NRUNS):
        n = int(rng.integers(CAP // 2, CAP))
        x[i, :n] = np.sort(rng.integers(0, 1 << 31, n,
                                        dtype=np.uint64).astype(np.uint32))
    jx = jnp.asarray(x)

    got = np.asarray(merge_sorted_runs_u32(jx))
    np.testing.assert_array_equal(got, np.sort(x.reshape(-1))[:NRUNS * CAP])
    print("on-chip merge parity OK")

    mg = jax.jit(merge_sorted_runs_u32)
    dt = rate(mg, (jx,))
    print(f"merge 8 runs (4.19M):  {dt*1e3:8.2f} ms")

    flat = jnp.asarray(x.reshape(-1))
    srt = jax.jit(lambda v: jax.lax.sort((v,), dimension=0, num_keys=1)[0])
    dt = rate(srt, (flat,))
    print(f"lax.sort   (4.19M):    {dt*1e3:8.2f} ms")

    # multi-word routed-run merge (h2/k2 = 2 words, k3/kw = 3; kw reaches
    # 5 at k=64 and 9 at k=128) vs the lax.sort re-sort it replaces
    for nw in (2, 3, 5, 9):
        ws = [np.full((NRUNS, CAP), 0xFFFFFFFF, dtype=np.uint32)
              for _ in range(nw)]
        for i in range(NRUNS):
            n = int(rng.integers(CAP // 2, CAP))
            cols = [rng.integers(0, 1 << 31, n, dtype=np.uint64)
                    .astype(np.uint32)] + \
                   [rng.integers(0, 1 << 32, n, dtype=np.uint64)
                    .astype(np.uint32) for _ in range(nw - 1)]
            order = np.lexsort(tuple(reversed(cols)))
            for w in range(nw):
                ws[w][i, :n] = cols[w][order]
        jws = tuple(jnp.asarray(w) for w in ws)

        got = [np.asarray(g) for g in merge_sorted_runs_words(jws)]
        flat_ws = [w.reshape(-1) for w in ws]
        order = np.lexsort(tuple(reversed(flat_ws)))
        for g, e in zip(got, (f[order] for f in flat_ws)):
            np.testing.assert_array_equal(g, e)
        print(f"on-chip {nw}-word merge parity OK")

        mg = jax.jit(merge_sorted_runs_words)
        dt = rate(mg, (jws,))
        print(f"merge 8 runs x {nw}w:     {dt*1e3:8.2f} ms")
        flats = tuple(jnp.asarray(f) for f in flat_ws)
        srtn = jax.jit(partial(jax.lax.sort, dimension=0, num_keys=nw))
        dt = rate(srtn, (flats,))
        print(f"lax.sort {nw}-op:        {dt*1e3:8.2f} ms")

    # 1-device mesh step (receiver re-sort now skipped)
    K, M, NB_PARTS, WINDOW_BITS, NSAMP, B, L = 31, 10, 64, 250048, 8, 4096, 1024
    G = B * L // 10
    genome = rng.choice(np.frombuffer(b"ACGT", dtype=np.uint8), size=G)
    starts = rng.integers(0, G - L, B)
    batch = genome[starts[:, None] + np.arange(L)]
    repart = Repartition.from_xxh(NB_PARTS, M)
    kps = B * (L - K + 1)
    args = (jnp.asarray(np.ascontiguousarray(batch.T)),
            jnp.asarray(np.full(B, L, np.int32)),
            jnp.asarray((np.arange(B, dtype=np.int32) * NSAMP) // B),
            jnp.asarray(repart.table.astype(np.int32)),
            jnp.asarray(np.full(NSAMP, 2, np.uint32)))
    mesh_step = build_sharded_pipeline(
        make_mesh(1), k=K, m=M, nb_parts=NB_PARTS, cap=kps,
        nsamp=NSAMP, hard_min=2, rmin=1, save_if=2, mode="hash",
        window_bits=WINDOW_BITS, static_repart=True, with_stats=False,
        batch_layout="lb")
    dt = rate(mesh_step, args, iters=5)
    print(f"mesh 1-dev step:       {dt*1e3:8.2f} ms "
          f"({kps/dt/1e6:7.1f} M kmers/s)")


if __name__ == "__main__":
    main()
