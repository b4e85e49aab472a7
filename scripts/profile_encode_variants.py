"""A/B the chunk-step encode cost: packed vs ascii input, L, lane align."""
import os
import sys
import time

repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, repo)

import jax
import jax.numpy as jnp
import numpy as np
from functools import partial

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(repo, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

from kmtricks_tpu.parallel.pipeline import (_encode_flat, pack_words,
                                            stream_layout)

K, M, NB_PARTS, NSAMP = 31, 10, 64, 10
layout = stream_layout(K, M, NB_PARTS, NSAMP, "kmer", None)
rng = np.random.default_rng(0)
table = rng.integers(0, NB_PARTS, 4 ** M).astype(np.int32)


@partial(jax.jit, static_argnames=("packed",))
def enc(b, vb, cl, cs, table, packed):
    batch = (b, vb) if packed else b
    keys, sampw, parts, valid = _encode_flat(
        batch, cl, cs, table, K, M, "kmer", None, "auto",
        NB_PARTS, "lb", True)
    words = pack_words(layout, parts, keys, sampw, valid, NSAMP)
    return tuple(jnp.sum(w, dtype=jnp.uint32) for w in words)


def timed(label, fn, nwin):
    r = fn()
    jax.tree.map(np.asarray, r)
    walls = []
    for _ in range(3):
        t0 = time.perf_counter()
        jax.tree.map(np.asarray, fn())
        walls.append(time.perf_counter() - t0)
    w = min(walls)
    print(f"{label}: {w*1e3:8.1f} ms = {w/nwin*1e9:5.2f} ns/win",
          flush=True)


def run(L, B, packed):
    nwin = (L - K + 1) * B
    cl = np.full(B, L, np.int32)
    cs = rng.integers(0, NSAMP, B).astype(np.int32)
    if packed:
        b = rng.integers(0, 256, (L // 4, B), dtype=np.uint8)
        vb = None
    else:
        b = rng.choice(np.frombuffer(b"ACGT", np.uint8), (L, B))
        vb = None
    timed(f"L={L:5d} B={B:6d} packed={int(packed)} ({nwin/1e6:5.1f}M win)",
          lambda: enc(b, vb, cl, cs, table, packed), nwin)


run(512, 8192, False)       # headline shape, ascii
run(512, 8192, True)        # headline shape, packed
run(1024, 62872, True)      # e2e chunk shape
run(1024, 62976, True)      # lane-aligned B (128 | B)
run(1024, 62976, False)     # lane-aligned, ascii
run(512, 125952, True)      # same windows, headline L
