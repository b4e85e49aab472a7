"""Break the streaming chunk step into encode/pack, sort, collapse."""
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

from kmtricks_tpu.parallel.pipeline import (_encode_flat, pack_words,
                                            stream_layout, sort_packed)
from kmtricks_tpu.ops.table import chunk_count_pairs

K, M, NB_PARTS, NSAMP = 31, 10, 64, 10
L, ROWS = 1024, 62872
PAIR_CAP = 1 << 23

layout = stream_layout(K, M, NB_PARTS, NSAMP, "kmer", None)
print("layout:", layout)
rng = np.random.default_rng(0)
pk = rng.integers(0, 256, (L // 4, ROWS), dtype=np.uint8)
cl = np.full(ROWS, L, np.int32)
cs = rng.integers(0, NSAMP, ROWS).astype(np.int32)
table = rng.integers(0, NB_PARTS, 4 ** M).astype(np.int32)


@jax.jit
def enc(pk, cl, cs, table):
    keys, sampw, parts, valid = _encode_flat(
        (pk, None), cl, cs, table, K, M, "kmer", None, "auto",
        NB_PARTS, "lb", True)
    words = pack_words(layout, parts, keys, sampw, valid, NSAMP)
    return tuple(jnp.sum(w, dtype=jnp.uint32) for w in words)


@jax.jit
def enc_sort(pk, cl, cs, table):
    keys, sampw, parts, valid = _encode_flat(
        (pk, None), cl, cs, table, K, M, "kmer", None, "auto",
        NB_PARTS, "lb", True)
    words = pack_words(layout, parts, keys, sampw, valid, NSAMP)
    ws = sort_packed(layout, words)
    return tuple(w[:8] for w in ws)


@jax.jit
def enc_sort_collapse(pk, cl, cs, table):
    keys, sampw, parts, valid = _encode_flat(
        (pk, None), cl, cs, table, K, M, "kmer", None, "auto",
        NB_PARTS, "lb", True)
    words = pack_words(layout, parts, keys, sampw, valid, NSAMP)
    ws = sort_packed(layout, words)
    pw, pc, n_pairs = chunk_count_pairs(ws, PAIR_CAP)
    return n_pairs


def timed(label, fn):
    r = fn(pk, cl, cs, table)
    jax.tree.map(lambda x: np.asarray(x), r)
    walls = []
    for _ in range(3):
        t0 = time.perf_counter()
        r = fn(pk, cl, cs, table)
        jax.tree.map(lambda x: np.asarray(x), r)
        walls.append(time.perf_counter() - t0)
    print(f"{label}: {min(walls)*1e3:8.1f} ms {[f'{w*1e3:.0f}' for w in walls]}",
          flush=True)


timed("encode+pack        ", enc)
timed("encode+pack+sort   ", enc_sort)
timed("enc+sort+collapse  ", enc_sort_collapse)
