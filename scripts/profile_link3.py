"""Sliced-parallel device_put of ONE chunk + device concat: stable rate?"""
import os
import sys
import time
from concurrent.futures import ThreadPoolExecutor

repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, repo)

import jax
import jax.numpy as jnp
import numpy as np

rng = np.random.default_rng(0)
A = rng.integers(0, 256, (256, 62872), dtype=np.uint8)  # 15.3 MB chunk
catf = jax.jit(lambda *xs: jnp.concatenate(xs, axis=0))

ex = ThreadPoolExecutor(max_workers=8)

for nslices in (1, 2, 4, 8, 16):
    bounds = np.linspace(0, A.shape[0], nslices + 1).astype(int)
    slices = [np.ascontiguousarray(A[bounds[i]:bounds[i + 1]])
              for i in range(nslices)]
    # warm
    ds = list(ex.map(jax.device_put, slices))
    np.asarray(catf(*ds)[-1, -8:])
    walls = []
    for _ in range(5):
        t0 = time.perf_counter()
        ds = list(ex.map(jax.device_put, slices))
        out = catf(*ds)
        np.asarray(out[-1, -8:])
        walls.append(time.perf_counter() - t0)
    mb = A.nbytes / 1e6
    r = sorted(mb / w for w in walls)
    print(f"{nslices:2d} slices: {r[2]:6.1f} MB/s median "
          f"(min {r[0]:.1f}, max {r[-1]:.1f})", flush=True)
