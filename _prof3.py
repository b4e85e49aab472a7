import time, numpy as np, jax, jax.numpy as jnp
from kmtricks_tpu.core.repartition import Repartition
from kmtricks_tpu.ops.encode import encode_batch
from kmtricks_tpu.ops.xxh64 import window_hash
from kmtricks_tpu.ops.count_merge import count_merge_flat

K,M,NB_PARTS,WINDOW_BITS,NSAMP,B,L = 31,10,64,250048,8,4096,1024
rng = np.random.default_rng(42)
batch = jnp.asarray(rng.choice(np.frombuffer(b"ACGT", dtype=np.uint8), size=(B,L)))
lengths = jnp.asarray(np.full(B, L, dtype=np.int32))
samp = jnp.asarray((np.arange(B, dtype=np.int32)*NSAMP)//B)
table = jnp.asarray(Repartition.from_xxh(NB_PARTS, M).table.astype(np.int32))
amin = jnp.asarray(np.full(NSAMP, 2, dtype=np.uint32))
NW = B*(L-K+1)
U32 = jnp.uint32

def stage(which):
    def fn(batch, lengths, samp, table, amin):
        hi, lo, parts, valid = encode_batch(batch, lengths, table, K, M)
        Bq, W = hi.shape
        hi, lo, parts, valid = hi.ravel(), lo.ravel(), parts.ravel(), valid.ravel()
        sampw = jnp.broadcast_to(samp[:, None], (Bq, W)).ravel()
        if which == "encode":
            return hi.sum() + lo.sum() + parts.sum() + valid.sum()
        hh, hl = window_hash([(hi, lo)], parts, WINDOW_BITS)
        if which == "hash":
            return hh.sum() + hl.sum()
        if which == "sort":
            s = jax.lax.sort(((~valid).astype(U32), hh, hl, sampw.astype(U32)), dimension=0, num_keys=4)
            return sum(x.sum() for x in s)
        out = count_merge_flat(parts, hh, hl, sampw, valid, amin,
                               nsamp=NSAMP, hard_min=2, rmin=1, save_if=2)
        return out[9].sum().astype(jnp.uint32)
    return jax.jit(fn)

args = (batch, lengths, samp, table, amin)
for which in ("encode", "hash", "sort", "full"):
    f = stage(which)
    r = f(*args); _=np.asarray(r)
    t0=time.perf_counter()
    for _ in range(10): r = f(*args)
    _=np.asarray(r)
    dt=(time.perf_counter()-t0)/10
    print(f"{which}: {dt*1000:.1f} ms ({NW/dt/1e6:.0f} M/s)", flush=True)
