"""Edge cases: empty samples, all-N reads, short reads, k == 32 boundary."""

import numpy as np
import pytest

from kmtricks_tpu.io import formats as F
from kmtricks_tpu.runtime.pipeline import PipelineOptions, run_pipeline


@pytest.fixture()
def edge_fof(tmp_path):
    a = tmp_path / "a.fasta"          # normal sample
    a.write_text(">r1\n" + "ACGTAGGCTTACGATCGATCGTACGATTACGGCAT" * 3 + "\n")
    b = tmp_path / "b.fasta"          # only invalid/short reads
    b.write_text(">r1\nNNNNNNNNNNNNNNNNNNNNNNNNNNNNNNNNNNNNNNNN\n>r2\nACG\n")
    fof = tmp_path / "e.fof"
    fof.write_text(f"A : {a}\nB : {b}\n")
    return str(fof)


@pytest.mark.parametrize("backend", ["host", "device", "mesh"])
def test_empty_sample_column(tmp_path, edge_fof, backend):
    """A sample with no valid k-mers still yields a (zero) matrix column."""
    kmdir = run_pipeline(PipelineOptions(
        fof=edge_fof, run_dir=str(tmp_path / backend), kmer_size=31,
        hard_min=1, soft_min="1", static_repart=True, nb_partitions=4,
        mode="kmer:count:bin", backend=backend))
    total = 0
    for p in range(4):
        _, kk, cc = F.read_matrix_file(
            kmdir.get_matrix_path(p, "count", "bin", "kmer", False))
        total += len(kk)
        if len(cc):
            assert (cc[:, 1] == 0).all()      # sample B contributes nothing
    assert total > 0


@pytest.mark.parametrize("backend", ["host", "device"])
def test_k_equals_32_boundary(tmp_path, backend):
    a = tmp_path / "a.fasta"
    rng = np.random.default_rng(32)
    a.write_text("".join(
        f">r{i}\n{bytes(rng.choice(np.frombuffer(b'ACGT', np.uint8), 80)).decode()}\n"
        for i in range(10)))
    fof = tmp_path / "k32.fof"
    fof.write_text(f"A : {a}\n")
    runs = {}
    for be in ("host", backend):
        runs[be] = run_pipeline(PipelineOptions(
            fof=str(fof), run_dir=str(tmp_path / f"r32{be}"), kmer_size=32,
            hard_min=1, soft_min="1", static_repart=True, nb_partitions=4,
            mode="kmer:count:bin", backend=be))
    for p in range(4):
        a1 = open(runs["host"].get_matrix_path(p, "count", "bin", "kmer",
                                               False), "rb").read()
        a2 = open(runs[backend].get_matrix_path(p, "count", "bin", "kmer",
                                                False), "rb").read()
        assert a1 == a2


def test_missing_fof_file_errors(tmp_path):
    fof = tmp_path / "bad.fof"
    fof.write_text(f"A : {tmp_path}/nope.fasta\n")
    with pytest.raises((FileNotFoundError, IOError)):
        run_pipeline(PipelineOptions(
            fof=str(fof), run_dir=str(tmp_path / "run"), kmer_size=31,
            static_repart=True, nb_partitions=4))


def test_single_read_single_sample(tmp_path):
    rng = np.random.default_rng(7)
    read = bytes(rng.choice(np.frombuffer(b"ACGT", np.uint8), 35)).decode()
    a = tmp_path / "one.fasta"
    a.write_text(f">r\n{read}\n")
    fof = tmp_path / "one.fof"
    fof.write_text(f"S : {a}\n")
    kmdir = run_pipeline(PipelineOptions(
        fof=str(fof), run_dir=str(tmp_path / "run"), kmer_size=31,
        hard_min=1, soft_min="1", static_repart=True, nb_partitions=4,
        mode="kmer:count:bin"))
    total = sum(len(F.read_matrix_file(
        kmdir.get_matrix_path(p, "count", "bin", "kmer", False))[1])
        for p in range(4))
    # 35 - 31 + 1 = 5 windows; random read -> distinct canonical k-mers
    assert total == 5
