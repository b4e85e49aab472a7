"""Differential property fuzz for `combine`:

    combine(run(fofA), run(fofB)) == run(fofA ++ fofB)

whenever the runs share a repartition (enforced here via the static
repartition) — the reference's MatrixMerger contract (matrix.hpp:
398-885). Checked byte-for-byte on the combined matrices across random
configurations and both count formats x kmer/hash. Run on CPU:

    python scripts/fuzz_combine.py [n_cases] [seed]
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

from kmtricks_tpu.runtime.combine import module_combine
from kmtricks_tpu.runtime.pipeline import PipelineOptions, run_pipeline

MODES = ["kmer:count:bin", "kmer:pa:bin", "hash:count:bin", "hash:pa:bin"]


def write_samples(rng, root, prefix, genome, nsamp, k):
    lines = []
    for s in range(nsamp):
        path = os.path.join(root, f"{prefix}{s}.fasta")
        with open(path, "w") as f:
            for r in range(int(rng.integers(4, 25))):
                ln = int(rng.integers(k, min(k + 150, len(genome))))
                start = int(rng.integers(0, len(genome) - ln))
                f.write(f">r{r}\n"
                        f"{bytes(genome[start:start + ln]).decode()}\n")
        lines.append(f"{prefix}{s} : {path}")
    return lines


def run(fof, run_dir, case):
    run_pipeline(PipelineOptions(
        fof=fof, run_dir=run_dir, kmer_size=case["k"], minim_size=case["m"],
        mode=case["mode"], backend="host", static_repart=True,
        nb_partitions=case["nb_parts"], hard_min=case["hard_min"],
        soft_min=case["soft_min"], share_min=0, recurrence_min=1,
        bloom_size=500_000))


def one_case(i, rng):
    case = dict(
        k=int(rng.choice([21, 31, 33, 47])),
        m=int(rng.choice([6, 8, 10])),
        mode=str(rng.choice(MODES)),
        nb_parts=int(rng.choice([4, 8])),
        hard_min=int(rng.integers(1, 3)),
        soft_min=str(rng.integers(1, 3)),
    )
    root = tempfile.mkdtemp(prefix=f"fzc{i}_")
    try:
        genome = rng.choice(np.frombuffer(b"ACGT", dtype=np.uint8),
                            size=int(rng.integers(2000, 5000)))
        la = write_samples(rng, root, "A", genome, int(rng.integers(2, 4)),
                           case["k"])
        lb = write_samples(rng, root, "B", genome, int(rng.integers(2, 4)),
                           case["k"])
        fa = os.path.join(root, "a.fof")
        fb = os.path.join(root, "b.fof")
        fu = os.path.join(root, "u.fof")
        open(fa, "w").write("\n".join(la) + "\n")
        open(fb, "w").write("\n".join(lb) + "\n")
        open(fu, "w").write("\n".join(la + lb) + "\n")
        run(fa, os.path.join(root, "ra"), case)
        run(fb, os.path.join(root, "rb"), case)
        run(fu, os.path.join(root, "ru"), case)
        out = os.path.join(root, "combined")
        module_combine([os.path.join(root, "ra"),
                        os.path.join(root, "rb")], out)
        md = os.path.join(out, "matrices")
        mu = os.path.join(root, "ru", "matrices")
        files = sorted(os.listdir(mu))
        assert sorted(os.listdir(md)) == files, "matrix sets differ"
        for f in files:
            a = open(os.path.join(md, f), "rb").read()
            b = open(os.path.join(mu, f), "rb").read()
            assert a == b, f"combined {f} != direct union run"
        return len(files), case
    finally:
        shutil.rmtree(root, ignore_errors=True)
        # every case compiles fresh unique-shape programs; without this
        # the accumulated LLVM JIT memory eventually fails allocation
        jax.clear_caches()


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    seed = int(sys.argv[2]) if len(sys.argv) > 2 else 99
    rng = np.random.default_rng(seed)
    for i in range(n):
        nf, case = one_case(i, rng)
        print(f"[{i + 1}/{n}] OK {nf:3d} matrices  {case}", flush=True)


if __name__ == "__main__":
    main()
