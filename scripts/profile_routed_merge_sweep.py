"""(nw, n_runs) sweep for the routed-merge cutoff (VERDICT r3 item 7).

Mesh receivers merge ndev sorted runs; the r2 measurement covered ONE
shape (8 runs x 512k). This sweeps word counts x run counts at a fixed
~4.2M total to ground the auto cutoff in data.
"""
import os
import sys
import time

repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, repo)

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(repo, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

from kmtricks_tpu.ops.pallas_sort import merge_sorted_runs_words

TOTAL = 1 << 22
rng = np.random.default_rng(0)


def mk(nw, nruns):
    cap = TOTAL // nruns
    base = np.sort(rng.integers(0, 1 << 62, (nruns, cap)).astype(
        np.uint64), axis=1)
    ws = []
    for j in range(nw):
        if j == 0:
            w = ((base >> np.uint64(32)).astype(np.uint32)
                 & np.uint32(0x7FFFFFFF))
        elif j == 1:
            w = base.astype(np.uint32)
        else:
            w = rng.integers(0, 1 << 32, (nruns, cap), dtype=np.uint32)
        ws.append(jax.device_put(w))
    return tuple(ws)


def timed(fn, sync, reps=3, iters=10):
    """Median of ``reps`` batches of ``iters`` dispatches with one sync:
    a single dispatch+fetch pays the ~30-40 ms tunnel round trip, which
    swamps ms-scale kernels."""
    r = fn(); np.asarray(sync(r))
    walls = []
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(iters):
            r = fn()
        np.asarray(sync(r))
        walls.append((time.perf_counter() - t0) / iters)
    walls.sort()
    return walls[len(walls) // 2]


print(f"total {TOTAL/1e6:.1f}M entries; median of 5", flush=True)
for nw in (1, 2, 3, 5):
    for nruns in (8, 16, 32):
        ws = mk(nw, nruns)
        sortf = jax.jit(lambda *w: jax.lax.sort(
            tuple(x.reshape(-1) for x in w), dimension=0, num_keys=nw))
        mergef = jax.jit(lambda *w: merge_sorted_runs_words(w))
        ts = timed(lambda: sortf(*ws), lambda r: r[0][:8]) * 1e3
        tm = timed(lambda: mergef(*ws), lambda r: r[0][:8]) * 1e3
        print(f"nw={nw} runs={nruns:2d}: sort {ts:7.1f} ms  "
              f"merge {tm:7.1f} ms  ({'MERGE' if tm < ts else 'sort'})",
              flush=True)
