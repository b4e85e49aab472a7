"""Do remote compiles parallelize through the axon tunnel?

If two distinct program shapes compile concurrently in ~the time of
one, the engine can compile-ahead its predicted shapes on background
threads and cut the cold-run walls (69-174 s, mostly serial compiles).
"""
import os
import sys
import time
from concurrent.futures import ThreadPoolExecutor

repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, repo)

import jax
import jax.numpy as jnp
import numpy as np

# NO persistent cache: measure真 compiles
rng = np.random.default_rng(0)


def mk(n):
    x = jax.device_put(rng.integers(0, 1 << 31, n, dtype=np.uint32))

    @jax.jit
    def f(a):
        s = jax.lax.sort((a, a ^ jnp.uint32(123)), dimension=0,
                         num_keys=2)
        return s[0][:8] + s[1][:8]
    return f, x


def compile_one(n):
    f, x = mk(n)
    t0 = time.perf_counter()
    np.asarray(f(x))
    return time.perf_counter() - t0


# serial: two fresh shapes
t0 = time.perf_counter()
w1 = compile_one(10_000_001)
w2 = compile_one(10_000_003)
serial = time.perf_counter() - t0
print(f"serial: {w1:.1f}s + {w2:.1f}s = {serial:.1f}s", flush=True)

# concurrent: two more fresh shapes
t0 = time.perf_counter()
with ThreadPoolExecutor(max_workers=2) as ex:
    ws = list(ex.map(compile_one, (10_000_005, 10_000_007)))
conc = time.perf_counter() - t0
print(f"concurrent: {ws[0]:.1f}s | {ws[1]:.1f}s -> wall {conc:.1f}s "
      f"({serial/conc:.2f}x)", flush=True)
