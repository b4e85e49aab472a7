"""More tunnel transfer variants: list-batched puts, dtypes, sizes."""
import os
import sys
import time

repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, repo)

import jax
import numpy as np

rng = np.random.default_rng(0)


def bench(label, mk, put, reps=5):
    xs = mk()
    d = put(xs)
    jax.block_until_ready(d)
    # sync via a tiny fetch (block_until_ready may not block through axon)
    walls = []
    for _ in range(reps):
        t0 = time.perf_counter()
        d = put(xs)
        leaves = jax.tree.leaves(d)
        for leaf in leaves:
            np.asarray(leaf.ravel()[-1:])
        walls.append(time.perf_counter() - t0)
    nb = sum(x.nbytes for x in jax.tree.leaves(xs)) / 1e6
    r = sorted(nb / w for w in walls)
    print(f"{label}: {r[len(r)//2]:6.1f} MB/s median "
          f"(min {r[0]:.1f}, max {r[-1]:.1f})", flush=True)


A15 = rng.integers(0, 256, (256, 62872), dtype=np.uint8)
bench("single 15MB u8      ", lambda: [A15],
      lambda xs: jax.device_put(xs[0]))
bench("list of 4x 15MB u8  ",
      lambda: [rng.integers(0, 256, (256, 62872), np.uint8)
               for _ in range(4)],
      lambda xs: jax.device_put(xs))
bench("single 15MB i32     ", lambda: [A15[:252].view(np.int32)],
      lambda xs: jax.device_put(xs[0]))
bench("single 60MB u8      ",
      lambda: [rng.integers(0, 256, (1024, 62872), np.uint8)],
      lambda xs: jax.device_put(xs[0]))
