import os, time, numpy as np, jax
os.makedirs("/root/repo/.jax_cache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
import jax.numpy as jnp
from kmtricks_tpu.core.repartition import Repartition
from kmtricks_tpu.ops.encode import encode_batch, ascii_to_codes, canonical64, sliding_min, mmer_canonical, mmer_allowed
from kmtricks_tpu.ops import u64 as U

K,M,NB_PARTS,B,L = 31,10,64,4096,1024
rng = np.random.default_rng(42)
batch = jnp.asarray(rng.choice(np.frombuffer(b"ACGT", dtype=np.uint8), size=(B,L)))
lengths = jnp.asarray(np.full(B, L, dtype=np.int32))
table = jnp.asarray(Repartition.from_xxh(NB_PARTS, M).table.astype(np.int32))
NW = B*(L-K+1)

import functools
@functools.partial(jax.jit, static_argnames=("k","m","with_table"))
def enc(batch, lengths, repart_table, k, m, with_table=True):
    Bq, Lq = batch.shape
    W = Lq - k + 1
    Wm = Lq - m + 1
    codes, char_valid = ascii_to_codes(batch)
    bad = (~char_valid).astype(jnp.int32)
    cs = jnp.cumsum(bad, axis=1)
    csz = jnp.pad(cs, ((0,0),(1,0)))
    win_clean = (csz[:, k:] - csz[:, :-k]) == 0
    pos = jax.lax.broadcasted_iota(jnp.int32, (Bq, W), 1)
    valid = win_clean & (pos + k <= lengths[:, None])
    hi = jnp.zeros((Bq, W), dtype=jnp.uint32); lo = jnp.zeros((Bq, W), dtype=jnp.uint32)
    for j in range(k):
        hi, lo = U.shl64((hi, lo), 2)
        lo = lo | jax.lax.dynamic_slice_in_dim(codes, j, W, axis=1)
    cano, _ = canonical64((hi, lo), k)
    mv = jnp.zeros((Bq, Wm), dtype=jnp.uint32)
    for j in range(m):
        mv = (mv << jnp.uint32(2)) | jax.lax.dynamic_slice_in_dim(codes, j, Wm, axis=1)
    mc = mmer_canonical(mv, m)
    sentinel = jnp.uint32((1 << (2*m)) - 1)
    masked = jnp.where(mmer_allowed(mc, m), mc, sentinel)
    minim = sliding_min(masked, k - m + 1)
    if with_table:
        parts = repart_table[minim.astype(jnp.int32)]
    else:
        parts = minim.astype(jnp.int32)
    return cano[0].sum(), cano[1].sum(), parts.sum(), valid.sum()

for wt in (True, False):
    f = functools.partial(enc, k=K, m=M, with_table=wt)
    r = f(batch, lengths, table); np.asarray(r[0])
    t0=time.perf_counter()
    for _ in range(10): r = f(batch, lengths, table)
    np.asarray(r[0]); dt=(time.perf_counter()-t0)/10
    print(f"encode with_table={wt}: {dt*1000:.1f} ms ({NW/dt/1e6:.0f} M/s)", flush=True)
