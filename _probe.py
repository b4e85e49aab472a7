import time, numpy as np, jax, jax.numpy as jnp
from kmtricks_tpu.core.repartition import Repartition
from kmtricks_tpu.parallel.pipeline import build_single_chip_step

K,M,NB_PARTS,WINDOW_BITS,NSAMP,B,L = 31,10,64,250048,8,4096,1024
rng = np.random.default_rng(42)
batch = rng.choice(np.frombuffer(b"ACGT", dtype=np.uint8), size=(B,L))
lengths = np.full(B, L, dtype=np.int32)
samp = (np.arange(B, dtype=np.int32)*NSAMP)//B
repart = Repartition.from_xxh(NB_PARTS, M)
amin = np.full(NSAMP, 2, dtype=np.uint32)
step = jax.jit(build_single_chip_step(k=K,m=M,nsamp=NSAMP,hard_min=2,rmin=1,save_if=2,mode="hash",window_bits=WINDOW_BITS))
args = (jnp.asarray(batch), jnp.asarray(lengths), jnp.asarray(samp),
        jnp.asarray(repart.table.astype(np.int32)), jnp.asarray(amin))
out = step(*args); jax.block_until_ready(out)
# individual timed calls
for i in range(3):
    t0=time.perf_counter(); jax.block_until_ready(step(*args)); print("step", time.perf_counter()-t0)
# check output does real work
print("rows:", int(np.asarray(out[6]).sum()), "stats row0:", np.asarray(out[9])[2][:4])
# plain 4M sort for comparison
x = jnp.asarray(rng.integers(0, 2**32, size=4_000_000, dtype=np.uint32))
srt = jax.jit(lambda a: jax.lax.sort((a,a,a,a,a), dimension=0, num_keys=5))
jax.block_until_ready(srt(x))
t0=time.perf_counter(); jax.block_until_ready(srt(x)); print("sort4M:", time.perf_counter()-t0)
print(jax.devices())
