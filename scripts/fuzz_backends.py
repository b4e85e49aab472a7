"""Randomized full-pipeline differential fuzz: host vs device vs mesh.

Draws random collections and pipeline configurations (k incl. wide
spans, all mode triples, rescue/soft-min variants, per-sample hard-min
overrides, compression, partition counts) and asserts every backend
produces byte-identical run-dir artifacts. Run on CPU (8 forced
devices):

    python scripts/fuzz_backends.py [n_cases] [seed]

Any failure prints the full config for reproduction.
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

from kmtricks_tpu.runtime.pipeline import PipelineOptions, run_pipeline

MODES_KMER = ["kmer:count:bin", "kmer:pa:bin", "kmer:count:text"]
MODES_HASH = ["hash:count:bin", "hash:pa:bin", "hash:bf:bin",
              "hash:bfc:bin", "hash:bft:bin"]


def make_collection(rng, root, nsamp, k):
    genome = rng.choice(np.frombuffer(b"ACGT", dtype=np.uint8),
                        size=int(rng.integers(2000, 8000)))
    lines = []
    for s in range(nsamp):
        path = os.path.join(root, f"S{s}.fasta")
        with open(path, "w") as f:
            for r in range(int(rng.integers(4, 40))):
                ln = int(rng.integers(k, min(k + 200, len(genome))))
                start = int(rng.integers(0, len(genome) - ln))
                read = bytearray(genome[start:start + ln])
                # sprinkle Ns
                for _ in range(int(rng.integers(0, 3))):
                    read[int(rng.integers(0, ln))] = ord("N")
                f.write(f">r{r}\n{bytes(read).decode()}\n")
        amin = f" ! {int(rng.integers(1, 3))}" if rng.random() < 0.3 else ""
        lines.append(f"S{s} : {path}{amin}")
    fof = os.path.join(root, "f.fof")
    with open(fof, "w") as f:
        f.write("\n".join(lines) + "\n")
    return fof


def draw_case(rng):
    k = int(rng.choice([15, 21, 27, 31, 32, 33, 47, 63, 64, 65, 101]))
    cf_hash = bool(rng.random() < 0.5)
    mode = str(rng.choice(MODES_HASH if cf_hash else MODES_KMER))
    return dict(
        k=k,
        m=int(rng.choice([6, 8, 10])),
        mode=mode,
        nsamp=int(rng.integers(2, 6)),
        nb_parts=int(rng.choice([3, 4, 8, 16])),
        hard_min=int(rng.integers(1, 3)),
        soft_min=str(rng.choice(["1", "2", "3", "0.4"])),
        share_min=int(rng.integers(0, 4)),
        recurrence_min=int(rng.integers(1, 3)),
        cpr=bool(rng.random() < 0.3),
        bloom_size=int(rng.choice([200_000, 1_000_000])),
        hist=bool(rng.random() < 0.3),
        mmer_scheme=str(rng.choice(["canonical", "forward"])),
    )


def artifacts(run_dir):
    out = {}
    for sub in ("matrices", "merge_infos", "fpr", "histograms", "filters"):
        d = os.path.join(run_dir, sub)
        if not os.path.isdir(d):
            continue
        for f in sorted(os.listdir(d)):
            with open(os.path.join(d, f), "rb") as fh:
                out[f"{sub}/{f}"] = fh.read()
    return out


def run_case(i, case, rng):
    root = tempfile.mkdtemp(prefix=f"fuzz{i}_")
    try:
        fof = make_collection(rng, root, case["nsamp"], case["k"])
        runs = {}
        for backend in ("host", "device", "mesh"):
            o = PipelineOptions(
                fof=fof, run_dir=os.path.join(root, backend),
                kmer_size=case["k"], minim_size=case["m"],
                mode=case["mode"], backend=backend, static_repart=True,
                nb_partitions=case["nb_parts"], hard_min=case["hard_min"],
                soft_min=case["soft_min"], share_min=case["share_min"],
                recurrence_min=case["recurrence_min"], cpr=case["cpr"],
                bloom_size=case["bloom_size"], hist=case["hist"],
                mmer_scheme=case["mmer_scheme"])
            run_pipeline(o)
            runs[backend] = artifacts(os.path.join(root, backend))
        host = runs["host"]
        for backend in ("device", "mesh"):
            other = runs[backend]
            assert set(other) == set(host), (
                f"artifact sets differ ({backend}): "
                f"{set(other) ^ set(host)}")
            for name in host:
                assert other[name] == host[name], \
                    f"{backend} differs on {name}"
        return len(host)
    finally:
        shutil.rmtree(root, ignore_errors=True)
        # every case compiles fresh unique-shape programs; without this
        # the accumulated LLVM JIT memory eventually fails allocation
        jax.clear_caches()


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 30
    seed = int(sys.argv[2]) if len(sys.argv) > 2 else 20260817
    rng = np.random.default_rng(seed)
    for i in range(n):
        case = draw_case(rng)
        try:
            na = run_case(i, case, rng)
            print(f"[{i + 1}/{n}] OK {na:3d} artifacts  {case}", flush=True)
        except Exception as e:
            print(f"[{i + 1}/{n}] FAIL {case}\n{type(e).__name__}: {e}",
                  flush=True)
            raise


if __name__ == "__main__":
    main()
