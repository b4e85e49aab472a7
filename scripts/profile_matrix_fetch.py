"""Decompose matrix_build_wall: step vs device_get vs host assembly.

Run on the real chip. Measures:
  - the fused step itself
  - device_get of the full 10-array output (current bench path)
  - device_get of one N-sized u32 array (link bandwidth probe)
  - host-side matrix scatter assembly
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import jax

cache = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     "..", ".jax_cache")
jax.config.update("jax_compilation_cache_dir", os.path.abspath(cache))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

import jax.numpy as jnp

from kmtricks_tpu.core.repartition import Repartition
from kmtricks_tpu.parallel.pipeline import build_single_chip_step

K, M, NB_PARTS = 31, 10, 64
rng = np.random.default_rng(42)


def fetch_small(out):
    return np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[:8])


def main():
    nsamp10 = 10
    g10 = rng.choice(np.frombuffer(b"ACGT", dtype=np.uint8),
                     size=2560 * 1024 // 10)
    s10s = rng.integers(0, len(g10) - 1024, 2560)
    b10 = g10[s10s[:, None] + np.arange(1024)]
    s10 = (np.arange(2560, dtype=np.int32) * nsamp10) // 2560
    amin10 = np.full(nsamp10, 2, dtype=np.uint32)
    repart = Repartition.from_xxh(NB_PARTS, M)
    step10 = jax.jit(build_single_chip_step(
        k=K, m=M, nsamp=nsamp10, hard_min=1, rmin=1, save_if=0,
        mode="kmer", static_repart_parts=NB_PARTS, with_stats=False,
        batch_layout="lb"))
    args10 = (jnp.asarray(np.ascontiguousarray(b10.T)),
              jnp.asarray(np.full(2560, 1024, np.int32)),
              jnp.asarray(s10), jnp.asarray(repart.table.astype(np.int32)),
              jnp.asarray(amin10))
    fetch_small(step10(*args10))   # compile
    N = 2560 * (1024 - K + 1)
    print(f"N = {N}")

    # step only
    t0 = time.perf_counter()
    outp = step10(*args10)
    fetch_small(outp)
    t_step = time.perf_counter() - t0
    print(f"step + small fetch: {t_step*1e3:.1f} ms")

    (part_s, keys_s, samp_s, final, cnt, present10, row_head, row_keep,
     _row_of, _stats) = outp

    # single-array fetch: link bandwidth probe
    t0 = time.perf_counter()
    _one = jax.device_get(final)
    t_one = time.perf_counter() - t0
    print(f"device_get 1 x u32[{N}] ({N*4/1e6:.0f} MB): {t_one*1e3:.1f} ms "
          f"-> {N*4/1e6/t_one:.0f} MB/s")

    # batched fetch of the current bench's 7 arrays
    t0 = time.perf_counter()
    (part_np, row_head_np, present_np, final_np, samp_np, keys0,
     keys1) = jax.device_get(
        (part_s, row_head, present10, final, samp_s, keys_s[0], keys_s[1]))
    t_fetch = time.perf_counter() - t0
    nbytes = sum(a.nbytes for a in (part_np, row_head_np, present_np,
                                    final_np, samp_np, keys0, keys1))
    print(f"device_get 7 arrays ({nbytes/1e6:.0f} MB): {t_fetch*1e3:.1f} ms "
          f"-> {nbytes/1e6/t_fetch:.0f} MB/s")
    print("dtypes:", [str(a.dtype) for a in (part_np, row_head_np,
                                             present_np, final_np, samp_np,
                                             keys0, keys1)])

    # host assembly
    t0 = time.perf_counter()
    row_head_b = row_head_np.astype(bool)
    present_b = present_np.astype(bool)
    row_of = np.cumsum(row_head_b) - 1
    nrows = int(row_of[-1]) + 1 if row_head_b.any() else 0
    mat = np.zeros((nrows, nsamp10), dtype=np.uint32)
    mat[row_of[present_b], samp_np[present_b]] = final_np[present_b]
    kk = (keys0[row_head_b].astype(np.uint64) << np.uint64(32)) \
        | keys1[row_head_b]
    t_host = time.perf_counter() - t0
    print(f"host assembly: {t_host*1e3:.1f} ms  nrows={nrows} "
          f"present={int(present_b.sum())}")


if __name__ == "__main__":
    main()


def main_compact():
    nsamp10 = 10
    g10 = rng.choice(np.frombuffer(b"ACGT", dtype=np.uint8),
                     size=2560 * 1024 // 10)
    s10s = rng.integers(0, len(g10) - 1024, 2560)
    b10 = g10[s10s[:, None] + np.arange(1024)]
    s10 = (np.arange(2560, dtype=np.int32) * nsamp10) // 2560
    amin10 = np.full(nsamp10, 2, dtype=np.uint32)
    repart = Repartition.from_xxh(NB_PARTS, M)
    from kmtricks_tpu.ops.compact import fetch_matrix, fetch_rows
    ROWS_CAP = 1 << 19   # 524288 >= ~262k rows
    step = jax.jit(build_single_chip_step(
        k=K, m=M, nsamp=nsamp10, hard_min=1, rmin=1, save_if=0,
        mode="kmer", static_repart_parts=NB_PARTS, with_stats=True,
        batch_layout="lb", compact_rows=ROWS_CAP))
    args10 = (jnp.asarray(np.ascontiguousarray(b10.T)),
              jnp.asarray(np.full(2560, 1024, np.int32)),
              jnp.asarray(s10), jnp.asarray(repart.table.astype(np.int32)),
              jnp.asarray(amin10))
    out = step(*args10)
    _ = int(out[5])   # compile + settle
    for rep in range(3):
        t0 = time.perf_counter()
        ku, mat, keep, part_rows, stats_pp, nrows_d, maxc = step(*args10)
        nr, maxv = int(nrows_d), int(maxc)
        t_sc = time.perf_counter() - t0
        pr = np.asarray(part_rows)
        stats = np.asarray(stats_pp)
        ku_h = fetch_rows(ku, nr)
        mat_h = fetch_matrix(mat, nr, maxv)
        t_fetch = time.perf_counter() - t0 - t_sc
        kk = (ku_h[:, 0].astype(np.uint64) << np.uint64(32)) | ku_h[:, 1]
        wall = time.perf_counter() - t0
        print(f"rep{rep}: wall {wall:.3f}s (step+scalars {t_sc:.3f}, "
              f"fetch {t_fetch:.3f}) nrows={nr} maxc={maxv} "
              f"bytes={(ku_h.nbytes + nr*nsamp10*(1 if maxv<256 else 2))/1e6:.1f}MB")


if __name__ == "__main__" and "--compact" in sys.argv:
    main_compact()
