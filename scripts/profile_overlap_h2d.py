"""Does an H2D device_put overlap an independent program's compute
through the tunnel? (r4 measured 'overlapped == serial' — re-check.)"""
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

host = np.random.default_rng(1).integers(0, 256, 20 << 20, dtype=np.uint8)

def fs(o):
    np.asarray(o[:8])

fs(burn(x)); d = jax.device_put(host); np.asarray(d[-8:])

t0 = time.perf_counter(); fs(burn(x)); t_c = time.perf_counter() - t0
t0 = time.perf_counter(); d = jax.device_put(host); np.asarray(d[-8:]); t_u = time.perf_counter() - t0
# overlapped: start the put on a thread, run compute on main
import threading
res = {}
def up():
    t1 = time.perf_counter()
    dd = jax.device_put(host)
    np.asarray(dd[-8:])
    res["u"] = time.perf_counter() - t1
t0 = time.perf_counter()
th = threading.Thread(target=up); th.start()
o = burn(x); fs(o)
th.join()
t_o = time.perf_counter() - t0
print(f"compute {t_c:.2f}s  upload20MB {t_u:.2f}s  overlapped-total {t_o:.2f}s "
      f"(serial {t_c+t_u:.2f}s; upload-thread saw {res['u']:.2f}s)")
