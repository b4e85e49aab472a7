"""Phase A alternatives: lax.sort concat vs Pallas multi-run merge."""
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

CAP = 1 << 23
rng = np.random.default_rng(0)


def mk_runs(nruns, nvalid):
    """nruns sorted unique runs of CAP entries (nvalid real, rest FF)."""
    ws = []
    base = np.sort(rng.integers(0, 1 << 62, (nruns, nvalid)).astype(
        np.uint64), axis=1)
    w0 = (base >> np.uint64(32)).astype(np.uint32) & np.uint32(0x7FFFFFFF)
    w1 = base.astype(np.uint32)
    w2 = rng.integers(0, 1 << 32, (nruns, nvalid), dtype=np.uint32)
    cnt = rng.integers(1, 100, (nruns, nvalid), dtype=np.uint32)
    out = []
    for arr in (w0, w1, w2, cnt):
        full = np.full((nruns, CAP), 0xFFFFFFFF, np.uint32)
        full[:, :nvalid] = arr
        out.append(full)
    out[3][:, nvalid:] = 0   # cnt pads with zeros
    return tuple(out)


def timed(label, fn, sync):
    r = fn(); jax.tree.map(np.asarray, sync(r))
    walls = []
    for _ in range(3):
        t0 = time.perf_counter()
        r = fn(); jax.tree.map(np.asarray, sync(r))
        walls.append(time.perf_counter() - t0)
    print(f"{label}: {min(walls)*1e3:8.1f} ms {[f'{w*1e3:.0f}' for w in walls]}",
          flush=True)


for nruns in (4, 8):
    runs = mk_runs(nruns, CAP * 3 // 4)
    dr = tuple(jax.device_put(w) for w in runs)

    sortf = jax.jit(lambda *ws: jax.lax.sort(
        tuple(w.reshape(-1) for w in ws), dimension=0, num_keys=4))
    mergef = jax.jit(lambda *ws: merge_sorted_runs_words(ws))
    timed(f"lax.sort   {nruns}x8.4M 4w", lambda: sortf(*dr),
          lambda r: r[0][:8])
    timed(f"pallas mrg {nruns}x8.4M 4w", lambda: mergef(*dr),
          lambda r: r[0][:8])
    # parity
    a = jax.tree.map(np.asarray, sortf(*dr))
    b = jax.tree.map(np.asarray, mergef(*dr))
    # compare as compound keys: same multiset => equal after identical sort
    ok = all(np.array_equal(x, y) for x, y in zip(a[:3], b[:3]))
    print(f"  key-parity({nruns} runs): {ok}", flush=True)
