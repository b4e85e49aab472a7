"""Streaming engine at wide k (kw packed layouts) == host backend."""

import pathlib

import numpy as np
import pytest

from kmtricks_tpu.runtime.pipeline import PipelineOptions, run_pipeline


@pytest.fixture(scope="module")
def fof_path(tmp_path_factory):
    root = tmp_path_factory.mktemp("widek_stream")
    rng = np.random.default_rng(99)
    genome = rng.choice(np.frombuffer(b"ACGT", dtype=np.uint8), size=6000)
    lines = []
    for s in range(3):
        p = root / f"S{s}.fasta"
        with open(p, "w") as f:
            for r in range(150):
                start = int(rng.integers(0, len(genome) - 140))
                f.write(f">r{r}\n"
                        f"{bytes(genome[start:start + 140]).decode()}\n")
        lines.append(f"S{s} : {p}")
    (root / "w.fof").write_text("\n".join(lines) + "\n")
    return str(root / "w.fof")


@pytest.mark.parametrize("k", [45, 63])
def test_stream_wide_k_equals_host(tmp_path, fof_path, k):
    """k > 32 routes through the kw packed layout in the chunk step,
    the sorted-run table merge and the finalize — byte-equal to host."""
    base = dict(fof=fof_path, kmer_size=k, hard_min=2, soft_min="2",
                mode="kmer:count:bin", static_repart=True,
                nb_partitions=8, backend="mesh")
    host = run_pipeline(PipelineOptions(
        run_dir=str(tmp_path / "host"), **{**base, "backend": "host"}))
    # tiny budget -> streaming chunks through the table engine
    mesh = run_pipeline(PipelineOptions(
        run_dir=str(tmp_path / "mesh"), max_memory_mb=1, **base))
    for p in range(8):
        a = open(host.get_matrix_path(p, "count", "bin", "kmer", False),
                 "rb").read()
        b = open(mesh.get_matrix_path(p, "count", "bin", "kmer", False),
                 "rb").read()
        assert a == b, f"partition {p} differs at k={k}"
        sa = open(host.get_merge_info_path(p)).read()
        sb = open(mesh.get_merge_info_path(p)).read()
        assert sa == sb, f"partition {p} stats differ at k={k}"
