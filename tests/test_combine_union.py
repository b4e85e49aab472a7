"""combine(run(A), run(B)) == run(A ++ B) under a shared repartition —
the MatrixMerger contract (matrix.hpp:398-885) as a checkable property.
Includes empty partitions (regression: hash-mode combine crashed
reshaping a zero-row key array)."""

import os

import numpy as np
import pytest

from kmtricks_tpu.runtime.combine import module_combine
from kmtricks_tpu.runtime.pipeline import PipelineOptions, run_pipeline


def _write(rng, root, prefix, genome, nsamp, k):
    lines = []
    for s in range(nsamp):
        p = root / f"{prefix}{s}.fasta"
        with open(p, "w") as f:
            for r in range(6):
                ln = int(rng.integers(k, k + 80))
                start = int(rng.integers(0, len(genome) - ln))
                f.write(f">r{r}\n"
                        f"{bytes(genome[start:start + ln]).decode()}\n")
        lines.append(f"{prefix}{s} : {p}")
    return lines


@pytest.mark.parametrize("mode", ["kmer:count:bin", "hash:pa:bin",
                                  "hash:count:bin"])
def test_combine_equals_union_run(tmp_path, mode):
    rng = np.random.default_rng(11)
    genome = rng.choice(np.frombuffer(b"ACGT", dtype=np.uint8), size=1500)
    la = _write(rng, tmp_path, "A", genome, 2, 31)
    lb = _write(rng, tmp_path, "B", genome, 3, 31)
    fofs = {}
    for name, lines in (("a", la), ("b", lb), ("u", la + lb)):
        f = tmp_path / f"{name}.fof"
        f.write_text("\n".join(lines) + "\n")
        fofs[name] = str(f)

    def run(fof, rd):
        run_pipeline(PipelineOptions(
            fof=fof, run_dir=str(tmp_path / rd), kmer_size=31,
            mode=mode, backend="host", static_repart=True,
            # 16 partitions over a tiny genome -> some partitions empty
            nb_partitions=16, hard_min=1, soft_min="1",
            bloom_size=200_000))

    run(fofs["a"], "ra")
    run(fofs["b"], "rb")
    run(fofs["u"], "ru")
    out = tmp_path / "combined"
    module_combine([str(tmp_path / "ra"), str(tmp_path / "rb")], str(out))
    files = sorted(os.listdir(tmp_path / "ru" / "matrices"))
    assert sorted(os.listdir(out / "matrices")) == files
    for f in files:
        a = open(out / "matrices" / f, "rb").read()
        b = open(tmp_path / "ru" / "matrices" / f, "rb").read()
        assert a == b, f
