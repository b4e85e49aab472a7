"""Stage-level timing of the mesh pipeline e2e run (plain flags — extra
jax debug options change the compile-cache key and force recompiles)."""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import jax

jax.config.update("jax_compilation_cache_dir", os.path.abspath(
    os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                 ".jax_cache")))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

import numpy as np
import jax.numpy as jnp

from kmtricks_tpu.runtime.pipeline import PipelineOptions, parse_mode
from kmtricks_tpu.runtime import device_pipeline as dp

T0 = time.perf_counter()


def mark(label):
    print(f"[{time.perf_counter() - T0:7.2f}s] {label}", flush=True)


def main():
    import shutil
    shutil.rmtree("/tmp/e2e_run", ignore_errors=True)
    opts = PipelineOptions(
        fof=os.environ.get("FOF", "/tmp/synth_bank/bank.fof"),
        run_dir="/tmp/e2e_run", kmer_size=31, hard_min=2, soft_min="2",
        mode="kmer:count:bin", backend="mesh", static_repart=True,
        nb_partitions=64, threads=4)

    from kmtricks_tpu.runtime.pipeline import (resolve_soft_min,
                                               stage_config, stage_repart)
    mark("start")
    kmdir, config = stage_config(opts)
    mark("config")
    repart = stage_repart(kmdir, config, opts)
    mark("repart")
    from kmtricks_tpu.io import sequences as seqio
    ests = [seqio.estimate(e.paths) for e in kmdir.fof]
    mark("estimates")
    batch, lengths, sarr = dp._load_global_batch(kmdir, opts,
                                                 opts.kmer_size, 1)
    mark(f"decode+assemble batch {batch.shape}")
    amin_vec = resolve_soft_min(opts.soft_min, kmdir, len(kmdir.fof))

    # inline stage_mesh_count_merge with timers
    from kmtricks_tpu.ops.compact import fetch_matrix, fetch_rows
    from kmtricks_tpu.parallel.pipeline import (build_sharded_pipeline,
                                                make_mesh)
    from kmtricks_tpu.host import ops as hops
    from kmtricks_tpu.runtime.pipeline import write_merge_outputs

    nsamp = len(kmdir.fof)
    mesh = make_mesh(1)
    n_windows = batch.shape[0] * (batch.shape[1] - config.kmer_size + 1)
    cf, window_bits, count_max, hard_mins = dp._mesh_common(
        kmdir, config, opts, uniform_hard_min=False)
    skew = dp.estimate_dest_skew(kmdir, opts, config, repart, 1)
    mark("skew estimate")
    local = n_windows
    cap = min(local, int(local * skew * 1.5) + 1024)
    rows_cap = 1 << 21
    step = build_sharded_pipeline(
        mesh, k=config.kmer_size, m=config.minim_size,
        nb_parts=config.nb_partitions, cap=cap, nsamp=nsamp,
        hard_min=hard_mins[0], rmin=1, save_if=0, mode=cf,
        window_bits=window_bits, count_max=count_max, static_repart=True,
        with_stats=True, batch_layout="lb", compact_rows=rows_cap)
    bt = np.ascontiguousarray(batch.T)
    mark("host transpose")
    args = (jnp.asarray(bt), jnp.asarray(lengths), jnp.asarray(sarr),
            jnp.asarray(repart.table.astype(np.int32)),
            jnp.asarray(amin_vec, dtype=np.uint32))
    jax.block_until_ready(args[0])
    mark(f"upload {bt.nbytes/1e6:.0f}MB batch")
    rows_d, pre_d, nrows_d, maxc_d, npres_d, dropped_d = step(*args)
    nrs, maxc, nd = jax.device_get((nrows_d, maxc_d, dropped_d))
    mark(f"step exec (nrows={int(nrs[0])} maxc={int(maxc)} "
         f"dropped={int(nd)})")
    nr = int(nrs[0])
    rows = fetch_rows(rows_d, nr)
    mark(f"fetch rows {rows.nbytes/1e6:.1f}MB")
    pre = fetch_matrix(pre_d, nr, int(maxc))
    mark(f"fetch pre (narrowed {'u8' if int(maxc)<256 else 'u16/u32'})")
    kwords = rows[:, :-1]
    keys = dp._keys_to_u64(tuple(kwords[:, j]
                                 for j in range(kwords.shape[1])))
    keys = keys.reshape(nr, max(1, kwords.shape[1] // 2))
    part_col = rows[:, -1].astype(np.int64)
    bounds = np.searchsorted(part_col, np.arange(config.nb_partitions + 1))
    mark("host keys/bounds")
    for p in range(config.nb_partitions):
        sl = slice(int(bounds[p]), int(bounds[p + 1]))
        res = hops.merge_dense(keys[sl], pre[sl], amin_vec, 1, 0)
        write_merge_outputs(kmdir, config, opts, p, res)
    mark("merge_dense + write 64 partitions")
    rate = n_windows / (time.perf_counter() - T0)
    print(f"TOTAL {time.perf_counter()-T0:.2f}s  {rate/1e6:.1f}M kmers/s")


if __name__ == "__main__":
    main()
