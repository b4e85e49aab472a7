"""Can concurrent device_put streams beat the ~15 MB/s tunnel rate?"""
import os
import sys
import time
from concurrent.futures import ThreadPoolExecutor

repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, repo)

import jax
import numpy as np

rng = np.random.default_rng(0)


def put_sync(a):
    d = jax.device_put(a)
    np.asarray(d[-8:])
    return d


for nthreads in (1, 2, 4, 8):
    parts = [rng.integers(0, 256, 15 << 20, dtype=np.uint8)
             for _ in range(nthreads)]
    with ThreadPoolExecutor(max_workers=nthreads) as ex:
        list(ex.map(put_sync, parts))  # warm
        walls = []
        for _ in range(2):
            t0 = time.perf_counter()
            list(ex.map(put_sync, parts))
            walls.append(time.perf_counter() - t0)
    w = min(walls)
    mb = 15 * nthreads
    print(f"{nthreads} threads x 15 MB: {w*1e3:7.1f} ms = {mb/w:6.1f} MB/s",
          flush=True)
