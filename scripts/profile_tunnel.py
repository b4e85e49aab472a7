"""Characterize the axon device tunnel: up/down bandwidth vs size,
duplex behavior, and whether host math on fetched arrays is lazy."""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import jax
import jax.numpy as jnp

rng = np.random.default_rng(0)


def t(fn):
    t0 = time.perf_counter()
    out = fn()
    return time.perf_counter() - t0, out


def main():
    dev = jax.devices()[0]
    print("device:", dev)

    for mb in (1, 4, 16, 64):
        n = mb * 1024 * 1024 // 4
        x = rng.integers(0, 2**31, n, dtype=np.int32)
        dt_up, xd = t(lambda: jax.device_put(x, dev))
        # ensure it landed
        _ = np.asarray(xd[:1])
        dt_up2, xd2 = t(lambda: jax.block_until_ready(jax.device_put(x, dev)))
        dt_dn, back = t(lambda: jax.device_get(xd))
        dt_sum, _ = t(lambda: int(back.sum()))
        print(f"{mb:3d}MB  up {mb/dt_up:7.1f} MB/s (put-only "
              f"{mb/dt_up2:7.1f})  down {mb/dt_dn:7.1f} MB/s  "
              f"host-sum-after {dt_sum*1e3:7.1f} ms")

    # parallel fetch: two threads fetching halves vs one fetch
    n = 16 * 1024 * 1024 // 4
    a = jax.device_put(rng.integers(0, 2**31, n, dtype=np.int32), dev)
    b = jax.device_put(rng.integers(0, 2**31, n, dtype=np.int32), dev)
    _ = np.asarray(a[:1]); _ = np.asarray(b[:1])
    dt_seq, _ = t(lambda: (jax.device_get(a), jax.device_get(b)))
    import threading
    res = [None, None]

    def fetch(i, arr):
        res[i] = jax.device_get(arr)

    t0 = time.perf_counter()
    ts = [threading.Thread(target=fetch, args=(i, arr))
          for i, arr in enumerate((a, b))]
    [x.start() for x in ts]; [x.join() for x in ts]
    dt_par = time.perf_counter() - t0
    print(f"fetch 2x16MB sequential {32/dt_seq:.1f} MB/s, "
          f"2 threads {32/dt_par:.1f} MB/s")

    # duplex: upload while downloading
    big = rng.integers(0, 2**31, n, dtype=np.int32)
    t0 = time.perf_counter()
    th = threading.Thread(target=lambda: jax.device_get(a))
    th.start()
    xd = jax.block_until_ready(jax.device_put(big, dev))
    th.join()
    dt_dup = time.perf_counter() - t0
    print(f"duplex 16MB up + 16MB down: {dt_dup:.2f}s "
          f"(vs ~{16/ (16/dt_seq*0.5):.2f}s if serialized)")

    # does compute overlap a fetch? (submit step while get in flight)
    f = jax.jit(lambda x: jnp.sort(x))
    _ = jax.block_until_ready(f(a))
    t0 = time.perf_counter()
    th = threading.Thread(target=lambda: jax.device_get(b))
    th.start()
    r = f(a)
    _ = np.asarray(r[:8])
    dt_step_during = time.perf_counter() - t0
    th.join()
    dt_total = time.perf_counter() - t0
    dt_alone, _ = t(lambda: np.asarray(f(a)[:8]))
    print(f"sort during fetch: step visible at {dt_step_during:.2f}s, "
          f"fetch done {dt_total:.2f}s; sort alone {dt_alone:.2f}s")


if __name__ == "__main__":
    main()
