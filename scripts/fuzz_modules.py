"""Differential fuzz for the module workflow:

    repart; superk --id S; count --id S; merge     (separate invocations)
        ==  pipeline                               (one-shot)

byte-for-byte on the matrices, across random configurations — the
reference's multi-process contract (independent processes coordinating
only through the run directory, SURVEY.md §2.5). Run on CPU:

    python scripts/fuzz_modules.py [n_cases] [seed]
"""
import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))
os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

from kmtricks_tpu.runtime.modules import (module_count, module_merge,
                                          module_repart, module_superk)
from kmtricks_tpu.runtime.pipeline import PipelineOptions, run_pipeline

MODES = ["kmer:count:bin", "kmer:pa:bin", "hash:count:bin", "hash:bf:bin"]


def one_case(i, rng):
    case = dict(
        k=int(rng.choice([21, 31, 32, 33, 47])),
        m=int(rng.choice([8, 10])),
        mode=str(rng.choice(MODES)),
        nsamp=int(rng.integers(2, 5)),
        nb_parts=int(rng.choice([4, 8])),
        hard_min=int(rng.integers(1, 3)),
        soft_min=str(rng.integers(1, 3)),
        share_min=int(rng.integers(0, 3)),
        cpr=bool(rng.random() < 0.3),
    )
    root = tempfile.mkdtemp(prefix=f"fzm{i}_")
    try:
        genome = rng.choice(np.frombuffer(b"ACGT", dtype=np.uint8),
                            size=int(rng.integers(1500, 4000)))
        lines = []
        for s in range(case["nsamp"]):
            path = os.path.join(root, f"S{s}.fasta")
            with open(path, "w") as f:
                for r in range(int(rng.integers(4, 20))):
                    ln = int(rng.integers(case["k"], case["k"] + 120))
                    start = int(rng.integers(0, len(genome) - ln))
                    f.write(f">r{r}\n"
                            f"{bytes(genome[start:start + ln]).decode()}\n")
            lines.append(f"S{s} : {path}")
        fof = os.path.join(root, "f.fof")
        open(fof, "w").write("\n".join(lines) + "\n")

        def opts(run_dir):
            return PipelineOptions(
                fof=fof, run_dir=run_dir, kmer_size=case["k"],
                minim_size=case["m"], mode=case["mode"], backend="host",
                static_repart=True,
                nb_partitions=case["nb_parts"], hard_min=case["hard_min"],
                soft_min=case["soft_min"], share_min=case["share_min"],
                recurrence_min=1, cpr=case["cpr"], bloom_size=300_000)

        rp = os.path.join(root, "pipe")
        run_pipeline(opts(rp))

        rm = os.path.join(root, "mods")
        o = opts(rm)
        module_repart(o)
        for s in range(case["nsamp"]):
            module_superk(rm, f"S{s}", o)
        for s in range(case["nsamp"]):
            module_count(rm, f"S{s}", o)
        module_merge(rm, o)

        a = sorted(os.listdir(os.path.join(rp, "matrices")))
        b = sorted(os.listdir(os.path.join(rm, "matrices")))
        assert a == b, (a, b)
        for f in a:
            x = open(os.path.join(rp, "matrices", f), "rb").read()
            y = open(os.path.join(rm, "matrices", f), "rb").read()
            assert x == y, f"module flow differs on {f}"
        return len(a), case
    finally:
        shutil.rmtree(root, ignore_errors=True)
        # every case compiles fresh unique-shape programs; without this
        # the accumulated LLVM JIT memory eventually fails allocation
        jax.clear_caches()


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 15
    seed = int(sys.argv[2]) if len(sys.argv) > 2 else 42
    rng = np.random.default_rng(seed)
    for i in range(n):
        nf, case = one_case(i, rng)
        print(f"[{i + 1}/{n}] OK {nf:3d} matrices  {case}", flush=True)


if __name__ == "__main__":
    main()
