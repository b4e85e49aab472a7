"""Profile the bench e2e (warm + timed, trace on) on the real chip.

Replicates bench.py's pipeline_e2e setup exactly; prints the stream
trace timeline of the TIMED run plus phase-level walls, so regressions
in the driver-captured number can be attributed (VERDICT r4 item 1/4).
Usage: python scripts/profile_e2e.py [--adaptive]
"""
import os
import shutil
import sys
import time

import numpy as np

os.environ.setdefault("KMTRICKS_STREAM_CHUNK_WINDOWS", "62500000")
if "--adaptive" not in sys.argv:
    os.environ.setdefault("KMTRICKS_STREAM_PAIR_CAP", str(1 << 23))

import jax

cache = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

_repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _repo)
sys.path.insert(0, os.path.join(_repo, "scripts"))
from gen_synth_bank import gen_bank

bank_dir = "/tmp/kmtricks_bench_bank_v1"
fof_p = os.path.join(bank_dir, "bank.fof")
if not os.path.exists(fof_p):
    gen_bank(bank_dir, nsamp=10, genome=1_000_000, coverage=30.0,
             read_len=1024, seed=42)

from kmtricks_tpu.runtime.device_pipeline import run_mesh_pipeline
from kmtricks_tpu.runtime.pipeline import PipelineOptions


def _opts(run_dir):
    return PipelineOptions(
        fof=fof_p, run_dir=run_dir, kmer_size=31, hard_min=2,
        soft_min="2", mode="kmer:count:bin", backend="mesh",
        static_repart=True, nb_partitions=64, threads=4,
        max_memory_mb=6000)


def _link_probe():
    blob = np.random.default_rng(3).integers(0, 256, 15 << 20,
                                             dtype=np.uint8)
    d = jax.device_put(blob); np.asarray(d[-8:])
    t = time.perf_counter()
    d = jax.device_put(blob); np.asarray(d[-8:])
    return 15 / (time.perf_counter() - t)


print(f"link before warm: {_link_probe():.1f} MB/s", flush=True)
os.environ["KMTRICKS_STREAM_TRACE"] = "1"
shutil.rmtree("/tmp/kmtricks_bench_e2e", ignore_errors=True)
t0 = time.perf_counter()
run_mesh_pipeline(_opts("/tmp/kmtricks_bench_e2e"))
print(f"WARM wall {time.perf_counter() - t0:.2f}s", flush=True)
print(f"link after warm: {_link_probe():.1f} MB/s", flush=True)

os.environ["KMTRICKS_STREAM_TRACE"] = "1"
shutil.rmtree("/tmp/kmtricks_bench_e2e", ignore_errors=True)
t0 = time.perf_counter()
run_mesh_pipeline(_opts("/tmp/kmtricks_bench_e2e"))
wall = time.perf_counter() - t0
n = 10 * (1_000_000 * 30 // 1024) * (1024 - 31 + 1)
print(f"TIMED wall {wall:.2f}s = {n/wall/1e6:.1f}M kmers/s", flush=True)
print(f"link after timed: {_link_probe():.1f} MB/s", flush=True)
