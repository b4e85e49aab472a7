"""Profile the streaming-engine e2e bench config with stage tracing.

Reproduces bench.py's pipeline_e2e run (same env caps -> same program
shapes -> persistent-cache hits) and prints the KMTRICKS_STREAM_TRACE
stage marks plus total wall, for warm and cold-in-process runs.
"""
import os
import shutil
import sys
import time

os.environ.setdefault("KMTRICKS_STREAM_TRACE", "1")
os.environ.setdefault("KMTRICKS_STREAM_PAIR_CAP", str(1 << 23))
os.environ.setdefault("KMTRICKS_STREAM_CHUNK_WINDOWS", str(62_500_000))

repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, repo)
sys.path.insert(0, os.path.join(repo, "scripts"))

import jax  # noqa: E402

cache = os.path.join(repo, ".jax_cache")
jax.config.update("jax_compilation_cache_dir", cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

from gen_synth_bank import gen_bank  # noqa: E402

from kmtricks_tpu.runtime.device_pipeline import run_mesh_pipeline  # noqa: E402
from kmtricks_tpu.runtime.pipeline import PipelineOptions  # noqa: E402

bank_dir = "/tmp/kmtricks_bench_bank_v1"
fof_p = os.path.join(bank_dir, "bank.fof")
if not os.path.exists(fof_p):
    gen_bank(bank_dir, nsamp=10, genome=1_000_000, coverage=30.0,
             read_len=1024, seed=42)


def opts(run_dir):
    return PipelineOptions(
        fof=fof_p, run_dir=run_dir, kmer_size=31, hard_min=2,
        soft_min="2", mode="kmer:count:bin", backend="mesh",
        static_repart=True, nb_partitions=64, threads=4,
        max_memory_mb=6000)


n_e2e = 10 * (1_000_000 * 30 // 1024) * (1024 - 31 + 1)
import itertools
for tag in ("warm0", "warm1", "warm2"):
    os.environ["KMTRICKS_STREAM_PROLOGUE"] = "0" if tag == "noprologue" else "1"
    shutil.rmtree("/tmp/kmtricks_bench_e2e", ignore_errors=True)
    t0 = time.perf_counter()
    run_mesh_pipeline(opts("/tmp/kmtricks_bench_e2e"))
    wall = time.perf_counter() - t0
    print(f"[{tag}] wall {wall:.2f}s = {n_e2e / wall / 1e6:.1f}M kmers/s",
          flush=True)
