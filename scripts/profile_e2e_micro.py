"""Micro-profile the streaming engine's per-chunk components on the
real chip: device chunk step (inputs resident), chunk upload, host
pack+transpose, decode. Uses the bench e2e shapes so programs are
cache-hits."""
import os
import sys
import time
import functools
print = functools.partial(print, flush=True)

os.environ["KMTRICKS_STREAM_PAIR_CAP"] = str(1 << 23)

repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, repo)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

cache = os.path.join(repo, ".jax_cache")
jax.config.update("jax_compilation_cache_dir", cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

from kmtricks_tpu.core.repartition import Repartition  # noqa: E402
from kmtricks_tpu.ops.encode import pack_2bit_host  # noqa: E402
from kmtricks_tpu.parallel.pipeline import (build_chunk_pairs_step,  # noqa: E402
                                            make_mesh, stream_layout)

K, M, NB_PARTS, NSAMP = 31, 10, 64, 10
L = 1024
W = L - K + 1
CHUNK_WINDOWS = 62_500_000
rows = max(8, (CHUNK_WINDOWS // W) // 8 * 8)
print(f"rows/chunk {rows}  windows {rows * W / 1e6:.1f}M")

rng = np.random.default_rng(0)
G = 1_000_000
genome = rng.choice(np.frombuffer(b"ACGT", dtype=np.uint8), size=G)
starts = rng.integers(0, G - L, rows)
batch = genome[starts[:, None] + np.arange(L)]
lens = np.full(rows, L, np.int32)
sarr = (np.arange(rows, dtype=np.int32) * NSAMP) // rows

t0 = time.perf_counter()
packed, vbits = pack_2bit_host(batch)
t1 = time.perf_counter()
pkT = np.ascontiguousarray(packed.T)
vbT = np.ascontiguousarray(vbits.T)
t2 = time.perf_counter()
print(f"pack {t1-t0:.2f}s  transpose {t2-t1:.2f}s  "
      f"({pkT.nbytes/1e6:.0f}+{vbT.nbytes/1e6:.0f} MB)")

print("building mesh...")
mesh = make_mesh(1)
layout = stream_layout(K, M, NB_PARTS, NSAMP, "kmer", None)
print("building repart table...")
repart = Repartition.from_xxh(NB_PARTS, M)
print("uploading repart table...")
table_jnp = jnp.asarray(repart.table.astype(np.int32))
np.asarray(table_jnp[:4])
print("repart table on device")

pair_cap = 1 << 23
local = rows * W
route_cap = local
step = build_chunk_pairs_step(
    mesh, k=K, m=M, nb_parts=NB_PARTS, cap=route_cap, nsamp=NSAMP,
    mode="kmer", window_bits=None, static_repart=True, batch_layout="lb",
    mmer_canonical=True, pair_cap=pair_cap, packed_input=True)

# upload timing
for i in range(3):
    t0 = time.perf_counter()
    d_pk = jax.device_put(pkT)
    d_vb = jax.device_put(vbT)
    d_cl = jax.device_put(lens)
    d_cs = jax.device_put(sarr)
    d_pk.block_until_ready()
    np.asarray(d_cs)  # force through tunnel
    t1 = time.perf_counter()
    mb = (pkT.nbytes + vbT.nbytes) / 1e6
    print(f"upload[{i}] {t1-t0:.2f}s  ({mb/(t1-t0):.0f} MB/s)")

# step timing (inputs resident)
args = (d_pk, d_vb, jnp.asarray(d_cl), jnp.asarray(d_cs), table_jnp)
out = step(*args)
np.asarray(out[2])
for i in range(4):
    t0 = time.perf_counter()
    out = step(*args)
    npairs = np.asarray(out[2])
    t1 = time.perf_counter()
    print(f"step[{i}] {t1-t0:.2f}s  n_pairs {int(npairs.max())}  "
          f"({rows*W/(t1-t0)/1e6:.0f}M win/s)")

# overlap test: dispatch two steps, then fetch
t0 = time.perf_counter()
o1 = step(*args)
o2 = step(*args)
np.asarray(o1[2]); np.asarray(o2[2])
t1 = time.perf_counter()
print(f"2 steps pipelined {t1-t0:.2f}s")

# upload while step computes (duplex check)
o1 = step(*args)
t0 = time.perf_counter()
d2 = jax.device_put(pkT)
d2.block_until_ready()
np.asarray(o1[2])
t1 = time.perf_counter()
print(f"step + overlapped upload {t1-t0:.2f}s")
