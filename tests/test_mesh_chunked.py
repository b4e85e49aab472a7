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


def test_chunked_hist_softmin_and_per_sample_hardmin(tmp_path, fof_path):
    """Features that need the host aggregation path: histograms, float
    soft-min quantiles, per-sample hard-min overrides."""
    import os

    # per-sample hard-min override in the fof
    lines = open(fof_path).read().splitlines()
    fof2 = tmp_path / "o.fof"
    fof2.write_text("\n".join(
        [lines[0] + " ! 3"] + lines[1:]) + "\n")

    kmdir = run_pipeline(PipelineOptions(
        fof=str(fof2), run_dir=str(tmp_path / "agg"), kmer_size=31,
        hard_min=2, soft_min="0.95", mode="kmer:count:bin",
        static_repart=True, nb_partitions=8, backend="mesh", hist=True))
    # histograms written, quantile thresholds persisted
    for s in range(4):
        assert os.path.exists(kmdir.get_hist_path(f"S{s}"))
    assert os.path.exists(kmdir.get_merge_th_path())

    # equivalent host run agrees byte-for-byte
    khost = run_pipeline(PipelineOptions(
        fof=str(fof2), run_dir=str(tmp_path / "host2"), kmer_size=31,
        hard_min=2, soft_min="0.95", mode="kmer:count:bin",
        static_repart=True, nb_partitions=8, backend="host", hist=True))
    for p in range(8):
        a = open(kmdir.get_matrix_path(p, "count", "bin", "kmer", False),
                 "rb").read()
        b = open(khost.get_matrix_path(p, "count", "bin", "kmer", False),
                 "rb").read()
        assert a == b, f"partition {p}"
        ha = open(kmdir.get_hist_path("S0"), "rb").read()
        hb = open(khost.get_hist_path("S0"), "rb").read()
        assert ha == hb
