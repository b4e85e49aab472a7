"""Differential fuzz for `filter`: module_filter's two-pointer outputs
vs an independent dict/set reference computed from the dumped matrix
and an independently counted key sample (MatrixFilter semantics,
matrix.hpp:23-341). Run on CPU:

    python scripts/fuzz_filter.py [n_cases] [seed]
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

from kmtricks_tpu.core.repartition import Repartition
from kmtricks_tpu.host.ops import count_sequences
from kmtricks_tpu.io import formats as F
from kmtricks_tpu.runtime.filter import module_filter
from kmtricks_tpu.runtime.pipeline import PipelineOptions, run_pipeline


def one_case(i, rng):
    case = dict(
        k=int(rng.choice([21, 31, 33, 47])),
        m=int(rng.choice([8, 10])),
        mode=str(rng.choice(["kmer:count:bin", "kmer:pa:bin"])),
        nsamp=int(rng.integers(2, 5)),
        nb_parts=int(rng.choice([4, 8])),
        filter_hard_min=int(rng.integers(1, 3)),
    )
    root = tempfile.mkdtemp(prefix=f"fzf{i}_")
    try:
        k = case["k"]
        genome = rng.choice(np.frombuffer(b"ACGT", dtype=np.uint8),
                            size=int(rng.integers(1500, 4000)))

        def reads(n):
            out = []
            for _ in range(n):
                ln = int(rng.integers(k, k + 120))
                start = int(rng.integers(0, len(genome) - ln))
                out.append(bytes(genome[start:start + ln]))
            return out

        lines = []
        for s in range(case["nsamp"]):
            path = os.path.join(root, f"S{s}.fasta")
            with open(path, "w") as f:
                for r, rd in enumerate(reads(int(rng.integers(4, 20)))):
                    f.write(f">r{r}\n{rd.decode()}\n")
            lines.append(f"S{s} : {path}")
        fof = os.path.join(root, "f.fof")
        open(fof, "w").write("\n".join(lines) + "\n")

        rd_dir = os.path.join(root, "run")
        run_pipeline(PipelineOptions(
            fof=fof, run_dir=rd_dir, kmer_size=k, minim_size=case["m"],
            mode=case["mode"], backend="host", static_repart=True,
            nb_partitions=case["nb_parts"], hard_min=1, soft_min="1"))

        key_reads = reads(int(rng.integers(4, 15)))
        kpath = os.path.join(root, "KEY.fasta")
        with open(kpath, "w") as f:
            for r, rdd in enumerate(key_reads):
                f.write(f">r{r}\n{rdd.decode()}\n")
        key_fof = os.path.join(root, "key.fof")
        open(key_fof, "w").write(f"KEY : {kpath}\n")

        out = os.path.join(root, "filtered")
        module_filter(rd_dir, key_fof, out,
                      hard_min=case["filter_hard_min"])

        # independent reference: count the key on the host golden path
        rep = Repartition.load(os.path.join(rd_dir, "repartition",
                                            "repartition.minimRepart"))
        sc = count_sequences(key_reads, k, case["m"], rep.table,
                             hard_min=case["filter_hard_min"])
        pa = case["mode"].split(":")[1] == "pa"
        cb = 4
        for p in range(case["nb_parts"]):
            kk, kc = sc.partitions.get(
                p, (np.zeros((0, (k + 31) // 32), np.uint64),
                    np.zeros(0, np.uint32)))
            key_map = {tuple(int(x) for x in row): int(c)
                       for row, c in zip(kk, kc)}
            mp = os.path.join(rd_dir, "matrices",
                              f"matrix_{p}.{'pa' if pa else 'count'}")
            if pa:
                info, mk, rows = F.read_pa_matrix_file(mp)
                mvals = rows
            else:
                info, mk, mvals = F.read_matrix_file(mp, cb)
            mat_keys = [tuple(int(x) for x in row) for row in mk]
            mat_set = set(mat_keys)

            # v: per matrix row the key count (count) / presence (pa)
            vexp = [(key_map.get(t, 0) if not pa
                     else int(t in key_map)) for t in mat_keys]
            vgot = [int(x) for x in open(
                os.path.join(out, "matrices", f"{p}.vec"))]
            assert vgot == vexp, f"v differs p{p}"

            # m: matrix rows present in the key
            omp = os.path.join(out, "matrices",
                               f"matrix_{p}.{'pa' if pa else 'count'}")
            if pa:
                _, gk, grows = F.read_pa_matrix_file(omp)
                exp_rows = [t for t in mat_keys if t in key_map]
                assert [tuple(int(x) for x in r) for r in gk] == exp_rows
            else:
                _, gk, gc = F.read_matrix_file(omp, cb)
                exp_rows = [t for t in mat_keys if t in key_map]
                assert [tuple(int(x) for x in r) for r in gk] == exp_rows
                for row, counts in zip(gk, gc):
                    t = tuple(int(x) for x in row)
                    assert int(counts[-1]) == key_map[t], f"m count p{p}"

            # k: key k-mers absent from the matrix
            kfile = os.path.join(out, "counts", f"partition_{p}",
                                 "KEY.kmer")
            _, fk, fc = F.read_kmer_file(kfile)
            got = {tuple(int(x) for x in row): int(c)
                   for row, c in zip(fk, fc)}
            exp = {t: c for t, c in key_map.items() if t not in mat_set}
            assert got == exp, f"k differs p{p}"
        return case
    finally:
        shutil.rmtree(root, ignore_errors=True)
        # every case compiles fresh unique-shape programs; without this
        # the accumulated LLVM JIT memory eventually fails allocation
        jax.clear_caches()


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 15
    seed = int(sys.argv[2]) if len(sys.argv) > 2 else 7
    rng = np.random.default_rng(seed)
    for i in range(n):
        case = one_case(i, rng)
        print(f"[{i + 1}/{n}] OK  {case}", flush=True)


if __name__ == "__main__":
    main()
