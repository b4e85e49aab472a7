import os, time, numpy as np, jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
import jax.numpy as jnp
from kmtricks_tpu.core.repartition import Repartition
from kmtricks_tpu.parallel.pipeline import build_single_chip_step

K,M,NB_PARTS,WINDOW_BITS,NSAMP = 31,10,64,250048,8
for B, L in ((4096,1024),(8192,1024),(16384,1024)):
    rng = np.random.default_rng(42)
    batch = jnp.asarray(rng.choice(np.frombuffer(b"ACGT", dtype=np.uint8), size=(B,L)))
    lengths = jnp.asarray(np.full(B, L, dtype=np.int32))
    samp = jnp.asarray((np.arange(B, dtype=np.int32)*NSAMP)//B)
    table = jnp.asarray(Repartition.from_xxh(NB_PARTS, M).table.astype(np.int32))
    amin = jnp.asarray(np.full(NSAMP, 2, dtype=np.uint32))
    NW = B*(L-K+1)
    step = jax.jit(build_single_chip_step(k=K,m=M,nsamp=NSAMP,hard_min=2,rmin=1,save_if=2,mode="hash",window_bits=WINDOW_BITS,static_repart_parts=NB_PARTS))
    args = (batch, lengths, samp, table, amin)
    np.asarray(step(*args)[-1])
    t0=time.perf_counter()
    for _ in range(6): out = step(*args)
    np.asarray(out[-1]); dt=(time.perf_counter()-t0)/6
    print(f"B={B}: {dt*1000:.1f} ms -> {NW/dt/1e6:.1f} M kmers/s", flush=True)
