"""Measure axon-tunnel device_put bandwidth + device-resident encode cost."""
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

# --- link bandwidth ---
for mb in (1, 4, 15, 60):
    a = np.random.default_rng(0).integers(0, 256, mb << 20, dtype=np.uint8)
    d = jax.device_put(a); np.asarray(d[:8])  # warm
    walls = []
    for _ in range(3):
        t0 = time.perf_counter()
        d = jax.device_put(a)
        np.asarray(d[-8:])
        walls.append(time.perf_counter() - t0)
    w = min(walls)
    print(f"device_put {mb:3d} MB: {w*1e3:7.1f} ms = {mb/w:6.1f} MB/s",
          flush=True)

# --- device-resident encode at chunk shape ---
K, M, NB_PARTS, NSAMP = 31, 10, 64, 10
L, B = 1024, 62872
layout = stream_layout(K, M, NB_PARTS, NSAMP, "kmer", None)
rng = np.random.default_rng(0)
pk = jax.device_put(rng.integers(0, 256, (L // 4, B), dtype=np.uint8))
cl = jax.device_put(np.full(B, L, np.int32))
cs = jax.device_put(rng.integers(0, NSAMP, B).astype(np.int32))
table = jax.device_put(rng.integers(0, NB_PARTS, 4 ** M).astype(np.int32))


@jax.jit
def enc(b, cl, cs, table):
    keys, sampw, parts, valid = _encode_flat(
        (b, None), cl, cs, table, K, M, "kmer", None, "auto",
        NB_PARTS, "lb", True)
    words = pack_words(layout, parts, keys, sampw, valid, NSAMP)
    return tuple(jnp.sum(w, dtype=jnp.uint32) for w in words)


from kmtricks_tpu.parallel.pipeline import sort_packed
from kmtricks_tpu.ops.table import chunk_count_pairs


@jax.jit
def full(b, cl, cs, table):
    keys, sampw, parts, valid = _encode_flat(
        (b, None), cl, cs, table, K, M, "kmer", None, "auto",
        NB_PARTS, "lb", True)
    words = pack_words(layout, parts, keys, sampw, valid, NSAMP)
    ws = sort_packed(layout, words)
    pw, pc, n_pairs = chunk_count_pairs(ws, 1 << 23)
    return n_pairs


for label, fn in (("encode+pack (dev-resident)", enc),
                  ("full chunk step (dev-res) ", full)):
    r = fn(pk, cl, cs, table); jax.tree.map(np.asarray, r)
    walls = []
    for _ in range(3):
        t0 = time.perf_counter()
        jax.tree.map(np.asarray, fn(pk, cl, cs, table))
        walls.append(time.perf_counter() - t0)
    w = min(walls)
    nwin = (L - K + 1) * B
    print(f"{label}: {w*1e3:7.1f} ms = {nwin/w/1e6:6.1f} M win/s", flush=True)
