"""Does a D2H copy overlap an independent program's device compute
through the axon tunnel? Decides phase-B group pipelining (VERDICT r5
item 5): with no overlap, splitting the compact into groups cannot
shorten the tail."""
import os, sys, time
_repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _repo)
import jax, jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", os.path.join(_repo, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

N = 1 << 22
x = jax.device_put(np.random.default_rng(0).integers(0, 2**31, N, dtype=np.uint32))

@jax.jit
def burn(x):
    for _ in range(40):
        x = jax.lax.sort((x,), dimension=0, num_keys=1)[0]
    return x

big = jax.device_put(np.random.default_rng(1).integers(0, 256, 20 << 20, dtype=np.uint8))

@jax.jit
def ident(b, s):
    return b + s     # fresh output each time (device_get caches per array)

def fetch_small(o):
    np.asarray(o[:8])

# warm
fetch_small(burn(x)); b1 = ident(big, jnp.uint8(1)); np.asarray(b1[-8:])

# A: compute alone
t0 = time.perf_counter(); fetch_small(burn(x)); t_c = time.perf_counter() - t0
# B: fetch alone
b2 = ident(big, jnp.uint8(2)); np.asarray(b2[-8:])   # materialize first
t0 = time.perf_counter(); h = np.asarray(b2); t_f = time.perf_counter() - t0
# C: fetch while compute runs (copy_to_host_async then burn)
b3 = ident(big, jnp.uint8(3)); np.asarray(b3[-8:])
t0 = time.perf_counter()
b3.copy_to_host_async()
o = burn(x)
fetch_small(o)
h3 = np.asarray(b3)
t_o = time.perf_counter() - t0
print(f"compute {t_c:.2f}s  fetch20MB {t_f:.2f}s  overlapped {t_o:.2f}s "
      f"(serial would be {t_c + t_f:.2f}s)")
