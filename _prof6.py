import os, time, numpy as np, jax
os.makedirs("/root/repo/.jax_cache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
import jax.numpy as jnp
from kmtricks_tpu.core.repartition import Repartition
from kmtricks_tpu.parallel.pipeline import build_single_chip_step
from kmtricks_tpu.ops.pallas_encode import encode_batch_pallas

K,M,NB_PARTS,WINDOW_BITS,NSAMP,B,L = 31,10,64,250048,8,4096,1024
rng = np.random.default_rng(42)
batch = jnp.asarray(rng.choice(np.frombuffer(b"ACGT", dtype=np.uint8), size=(B,L)))
lengths = jnp.asarray(np.full(B, L, dtype=np.int32))
samp = jnp.asarray((np.arange(B, dtype=np.int32)*NSAMP)//B)
table = jnp.asarray(Repartition.from_xxh(NB_PARTS, M).table.astype(np.int32))
amin = jnp.asarray(np.full(NSAMP, 2, dtype=np.uint32))
NW = B*(L-K+1)

f = jax.jit(lambda b,l,t: [x.sum() for x in encode_batch_pallas(b,l,t,K,M)])
r = f(batch, lengths, table); np.asarray(r[0])
t0=time.perf_counter()
for _ in range(10): r = f(batch, lengths, table)
np.asarray(r[0]); dt=(time.perf_counter()-t0)/10
print(f"enc_pallas: {dt*1000:.1f} ms ({NW/dt/1e6:.0f} M/s)", flush=True)

step = jax.jit(build_single_chip_step(k=K,m=M,nsamp=NSAMP,hard_min=2,rmin=1,save_if=2,mode="hash",window_bits=WINDOW_BITS,encode_impl="pallas"))
args = (batch, lengths, samp, table, amin)
out = step(*args); np.asarray(out[9])[:1,:1]
t0=time.perf_counter()
for _ in range(10): out = step(*args)
np.asarray(out[9])[:1,:1]; dt=(time.perf_counter()-t0)/10
print(f"step[pallas]: {dt*1000:.1f} ms -> {NW/dt/1e6:.1f} M kmers/s", flush=True)
