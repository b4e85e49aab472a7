"""BASELINE config-3 shape: 50-sample BF vector + bit-transpose to
per-sample BFs (HowDe-SBT-ready), bf/bft/bfc cross-consistency."""

import numpy as np
import pytest

from kmtricks_tpu.core.hashers import HashWindow
from kmtricks_tpu.io import formats as F
from kmtricks_tpu.io.howde import read_bf_file
from kmtricks_tpu.runtime.pipeline import PipelineOptions, run_pipeline

NSAMP = 50


@pytest.fixture(scope="module")
def fof_path(tmp_path_factory):
    root = tmp_path_factory.mktemp("bf50")
    rng = np.random.default_rng(5)
    genome = rng.choice(np.frombuffer(b"ACGT", dtype=np.uint8), size=5000)
    lines = []
    for s in range(NSAMP):
        p = root / f"S{s:02d}.fasta"
        with open(p, "w") as f:
            for r in range(20):
                start = int(rng.integers(0, len(genome) - 100))
                f.write(f">r{r}\n"
                        f"{bytes(genome[start:start + 100]).decode()}\n")
        lines.append(f"S{s:02d} : {p}")
    (root / "bf50.fof").write_text("\n".join(lines) + "\n")
    return str(root / "bf50.fof")


def run(tmp_path, fof_path, mode, name, **kw):
    return run_pipeline(PipelineOptions(
        fof=fof_path, run_dir=str(tmp_path / name), kmer_size=31,
        hard_min=1, soft_min="1", mode=mode, static_repart=True,
        nb_partitions=8, bloom_size=500_000, **kw))


def test_bft_per_sample_filters(tmp_path, fof_path):
    kbf = run(tmp_path, fof_path, "hash:bf:bin", "bf")
    kbft = run(tmp_path, fof_path, "hash:bft:bin", "bft")
    hw = HashWindow.load(kbf.hash_win)

    # per-sample .bf filters exist and agree with the vertical bf columns
    cols = np.zeros((hw.bloom_size, NSAMP), dtype=np.uint8)
    for p in range(8):
        _, rows = F.read_vector_matrix_file(
            kbf.get_matrix_path(p, "bf", "bin", "hash", False))
        bits = np.unpackbits(rows, axis=1, bitorder="little")[:, :NSAMP]
        cols[hw.lower(p):hw.lower(p) + hw.window_size_bits] = bits
    total_set = 0
    for s in range(NSAMP):
        meta, raw = read_bf_file(kbft.get_filter_path(f"S{s:02d}"))
        assert meta["numBits"] == hw.bloom_size
        got = np.unpackbits(raw[:hw.bloom_size // 8], bitorder="little")
        assert (got == cols[:, s]).all(), f"sample {s} BF mismatch"
        total_set += int(got.sum())
    assert total_set > 0


def test_bfc_counting_rows(tmp_path, fof_path):
    kbfc = run(tmp_path, fof_path, "hash:bfc:bin", "bfc", bitw=2)
    kbf = run(tmp_path, fof_path, "hash:bf:bin", "bf2")
    for p in range(8):
        info_c, rows_c = F.read_vector_matrix_file(
            kbfc.get_matrix_path(p, "bfc", "bin", "hash", False))
        info_b, rows_b = F.read_vector_matrix_file(
            kbf.get_matrix_path(p, "bf", "bin", "hash", False))
        assert info_c.bits == NSAMP * 2
        # presence agreement: a counting cell > 0 iff the bf bit is set.
        # bfc cells are MSB-first (bitpacker order); bf rows are LSB-first
        # (BITSET order) — see host/ops.py:pack_counting_bf
        cbits = np.unpackbits(rows_c, axis=1, bitorder="big")
        cells = (cbits[:, 0:2 * NSAMP:2] | cbits[:, 1:2 * NSAMP:2])
        bbits = np.unpackbits(rows_b, axis=1, bitorder="little")[:, :NSAMP]
        assert (cells == bbits).all()
