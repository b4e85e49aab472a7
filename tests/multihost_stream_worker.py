"""Worker for the two-process streaming-ENGINE tests (run via subprocess).

Usage: python multihost_stream_worker.py <pid> <nproc> <port> <fof>
           <rundir> [<mode> <soft_min> <hist>]

Each process contributes 4 forced CPU devices to a global 8-device mesh
(jax.distributed over localhost + gloo — the DCN analogue) and runs the
PRODUCTION streaming engine (stage_mesh_stream, chunked, with forced
mid-stream folds) against a SHARED run directory: process 0 runs
config+repart, the other loads them from the run dir (the reference's
module re-runnability contract), then both run the engine and each
writes the partitions its devices own.

Decode is SAMPLE-STRIPED across processes: the worker asserts it parsed
strictly less than the whole collection and records its share.
"""
import os
import sys

pid, nproc, port, fof, rundir = (int(sys.argv[1]), int(sys.argv[2]),
                                 sys.argv[3], sys.argv[4], sys.argv[5])
mode = sys.argv[6] if len(sys.argv) > 6 else "kmer:count:bin"
soft_min = sys.argv[7] if len(sys.argv) > 7 else "2"
want_hist = len(sys.argv) > 8 and sys.argv[8] == "1"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
os.environ["KMTRICKS_STREAM_TABLE_CAP"] = "4096"   # force mid-stream folds

import jax

jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(f"localhost:{port}", nproc, pid)

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))
from jax.experimental import multihost_utils

from kmtricks_tpu.core.repartition import Repartition
from kmtricks_tpu.runtime.config import Config
from kmtricks_tpu.runtime.kmdir import KmDir
from kmtricks_tpu.runtime.pipeline import (PipelineOptions, resolve_soft_min,
                                           stage_config, stage_repart)
from kmtricks_tpu.runtime import stream_engine
from kmtricks_tpu.runtime.device_pipeline import _is_float_quantile
from kmtricks_tpu.runtime.stream_engine import stage_mesh_stream

assert jax.device_count() == 4 * nproc, jax.devices()

opts = PipelineOptions(fof=fof, run_dir=rundir, kmer_size=31, hard_min=1,
                       soft_min=soft_min, share_min=2, mode=mode,
                       static_repart=True, nb_partitions=8, backend="mesh",
                       max_memory_mb=64, hist=want_hist, threads=2)
if _is_float_quantile(soft_min):
    opts.hist = True          # run_pipeline's implicit enable
if pid == 0:
    kmdir, config = stage_config(opts)
    repart = stage_repart(kmdir, config, opts)
multihost_utils.sync_global_devices("config_repart_done")
if pid != 0:
    kmdir = KmDir.init(rundir)
    config = Config.load(kmdir.config_storage)
    repart = Repartition.load(kmdir.repart_path)
amin = None
if not _is_float_quantile(soft_min):
    amin = resolve_soft_min(opts.soft_min, kmdir, len(kmdir.fof))

stage_mesh_stream(kmdir, config, opts, repart, amin, chunk_windows=3000,
                  use_stream=True)
multihost_utils.sync_global_devices("writes_done")

# sharded-decode contract: this worker parsed only its sample stripe
total_reads = int(os.environ.get("KMTRICKS_TEST_TOTAL_READS", "600"))
assert 0 < stream_engine.last_local_rows < total_reads, \
    stream_engine.last_local_rows
with open(os.path.join(rundir, f"decode_rows_{pid}.txt"), "w") as f:
    f.write(str(stream_engine.last_local_rows))
print("proc", pid, "done", flush=True)
