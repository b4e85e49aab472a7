"""Chunked mesh pipeline (memory-bounded streaming) == single-step mesh."""

import numpy as np
import pytest

from kmtricks_tpu.runtime.pipeline import PipelineOptions, run_pipeline


@pytest.fixture(scope="module")
def fof_path(tmp_path_factory):
    root = tmp_path_factory.mktemp("chunks")
    rng = np.random.default_rng(77)
    genome = rng.choice(np.frombuffer(b"ACGT", dtype=np.uint8), size=8000)
    lines = []
    for s in range(4):
        p = root / f"S{s}.fasta"
        with open(p, "w") as f:
            for r in range(200):
                start = int(rng.integers(0, len(genome) - 120))
                f.write(f">r{r}\n"
                        f"{bytes(genome[start:start + 120]).decode()}\n")
        lines.append(f"S{s} : {p}")
    (root / "c.fof").write_text("\n".join(lines) + "\n")
    return str(root / "c.fof")


@pytest.mark.parametrize("mode", ["kmer:count:bin", "hash:bf:bin"])
def test_chunked_equals_single_step(tmp_path, fof_path, mode):
    base = dict(fof=fof_path, kmer_size=31, hard_min=2, soft_min="2",
                share_min=2, mode=mode, static_repart=True,
                nb_partitions=8, bloom_size=1_000_000, backend="mesh")
    one = run_pipeline(PipelineOptions(run_dir=str(tmp_path / "one"),
                                       max_memory_mb=8192, **base))
    # tiny budget -> many chunks (each read is 120bp -> 90 windows;
    # 1 MB budget / 48B = ~20k windows per chunk => ~4 chunks of reads)
    many = run_pipeline(PipelineOptions(run_dir=str(tmp_path / "many"),
                                        max_memory_mb=1, **base))
    cf, m, _ = mode.split(":")
    for p in range(8):
        a = open(one.get_matrix_path(p, m, "bin", cf, False), "rb").read()
        b = open(many.get_matrix_path(p, m, "bin", cf, False), "rb").read()
        assert a == b, f"partition {p}: chunked != single-step ({mode})"
        sa = open(one.get_merge_info_path(p)).read()
        sb = open(many.get_merge_info_path(p)).read()
        assert sa == sb, f"partition {p} stats differ"
