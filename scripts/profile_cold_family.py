"""Fresh-program-family cold wall for a ladder5-class run (k=33 so no
persistent-cache entry exists) with the stream tracer on — shows the
serial compile chain (VERDICT r5 item 6)."""
import os, sys, time
_repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _repo)
os.environ["KMTRICKS_STREAM_TRACE"] = "1"
import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir", os.path.join(_repo, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

import tempfile
from kmtricks_tpu.runtime.pipeline import PipelineOptions, run_pipeline

K = 33 if len(sys.argv) < 2 else int(sys.argv[1])
td = tempfile.mkdtemp()
g = np.random.default_rng(7).choice(np.frombuffer(b"ACGT", dtype=np.uint8),
                                    size=100_000)
rr = np.random.default_rng(8)
lines = []
for s in range(1000):
    p = os.path.join(td, f"S{s}.fasta")
    starts = rr.integers(0, 100_000 - 512, 12)
    with open(p, "wb") as f:
        for i, st in enumerate(starts):
            f.write(b">r%d\n" % i)
            f.write(g[st:st + 512].tobytes() + b"\n")
    lines.append(f"S{s} : {p}")
fof = os.path.join(td, "bank.fof")
open(fof, "w").write("\n".join(lines) + "\n")

t0 = time.perf_counter()
run_pipeline(PipelineOptions(
    fof=fof, run_dir=os.path.join(td, "run"), kmer_size=K, threads=4,
    hard_min=1, soft_min="1", mode="kmer:pa:bin", nb_partitions=16,
    static_repart=True, backend="mesh", max_memory_mb=128))
print(f"COLD k={K}: {time.perf_counter()-t0:.1f}s", flush=True)
if "--once" not in sys.argv:
    t0 = time.perf_counter()
    run_pipeline(PipelineOptions(
        fof=fof, run_dir=os.path.join(td, "run2"), kmer_size=K, threads=4,
        hard_min=1, soft_min="1", mode="kmer:pa:bin", nb_partitions=16,
        static_repart=True, backend="mesh", max_memory_mb=128))
    print(f"WARM k={K}: {time.perf_counter()-t0:.1f}s", flush=True)
