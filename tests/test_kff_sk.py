"""KFF minimizer-section ('m') tests — KffSkWriter parity
(kff_file.hpp:136-206) + the `count --mode kff-sk` module path."""

import pathlib

import numpy as np
import pytest

from kmtricks_tpu.io.kff import (read_kff_sk_file, write_kff_sk_file,
                                 _pack_seq, _unpack_seq)

REF = pathlib.Path("/root/reference/tests/data")


def test_pack_unpack_seq_roundtrip():
    rng = np.random.default_rng(0)
    for n in (1, 2, 3, 4, 5, 31, 64, 255):
        codes = rng.integers(0, 4, n, dtype=np.uint8)
        np.testing.assert_array_equal(
            _unpack_seq(_pack_seq(codes), n), codes)


def test_kff_sk_roundtrip(tmp_path):
    rng = np.random.default_rng(1)
    k, m = 11, 4
    blocks = []
    for _ in range(20):
        nk = int(rng.integers(1, 30))
        codes = rng.integers(0, 4, k + nk - 1, dtype=np.uint8)
        pos = int(rng.integers(0, len(codes) - m + 1))
        counts = rng.integers(0, 255, nk, dtype=np.uint32)
        blocks.append((codes, pos, counts))
    path = str(tmp_path / "sk.kff")
    write_kff_sk_file(path, blocks, k, m)
    gvars, back = read_kff_sk_file(path)
    assert gvars == {"k": k, "m": m, "max": 255, "data_size": 1}
    # sections group by minimizer: order differs, compare as multisets
    def keyed(bs):
        return sorted((c.tobytes(), p, tuple(int(x) for x in ct))
                      for c, p, ct in bs)
    assert keyed(back) == keyed(blocks)


def test_kff_sk_single_kmer_block(tmp_path):
    k, m = 7, 3
    codes = np.array([0, 1, 2, 3, 0, 1, 2], dtype=np.uint8)
    path = str(tmp_path / "one.kff")
    write_kff_sk_file(path, [(codes, 2, np.array([9]))], k, m)
    _, back = read_kff_sk_file(path)
    assert len(back) == 1
    np.testing.assert_array_equal(back[0][0], codes)
    assert back[0][1] == 2 and back[0][2][0] == 9


def test_count_module_kff_sk(tmp_path):
    """count --mode kff-sk on the reference toy data: blocks decode back to
    superkmers whose k-mer counts match the kmer-mode count files."""
    if not REF.exists():
        pytest.skip("reference data absent")
    import shutil

    from kmtricks_tpu.core import kmer as kops
    from kmtricks_tpu.host import ops as hops
    from kmtricks_tpu.io import formats as F
    from kmtricks_tpu.runtime.modules import (module_count, module_repart,
                                              module_superk)
    from kmtricks_tpu.runtime.pipeline import PipelineOptions

    repart_src = tmp_path / "rs"
    (repart_src / "repartition").mkdir(parents=True)
    shutil.copyfile(REF / "repart_gatb" / "repartition.minimRepart",
                    repart_src / "repartition" / "repartition.minimRepart")
    fof = tmp_path / "t.fof"
    fof.write_text(f"D1 : {REF}/1.fasta\nD2 : {REF}/2.fasta\n")
    opts = PipelineOptions(fof=str(fof), run_dir=str(tmp_path / "run"),
                           kmer_size=31, hard_min=1, soft_min="1",
                           repart_from=str(repart_src),
                           mode="kmer:count:bin")
    module_repart(opts)
    module_superk(opts.run_dir, "D1", opts)
    module_count(opts.run_dir, "D1", opts, count_mode="kff-sk")
    module_count(opts.run_dir, "D1", opts, count_mode="kmer")

    k = 31
    for p in range(4):
        _, gk, gc = F.read_kmer_file(
            str(tmp_path / "run" / "counts" / f"partition_{p}" / "D1.kmer"))
        gvars, blocks = read_kff_sk_file(
            str(tmp_path / "run" / "counts" / f"partition_{p}" / "D1.kff"))
        assert gvars["k"] == 31 and gvars["m"] == 10
        # expand every block back to canonical kmers + counts; the distinct
        # (kmer -> count) map must equal the kmer-mode output
        got = {}
        for codes, pos, counts in blocks:
            kk = kops.canonical(kops.kmers_from_codes(codes, k), k)
            for row, c in zip(kk, counts):
                key = row.tobytes()
                assert got.get(key, int(c)) == int(c)
                got[key] = int(c)
        exp = {gk[i].tobytes(): int(min(gc[i], 255))
               for i in range(len(gc))}
        assert got == exp


def test_count_module_kff_sk_wide_k(tmp_path):
    """k > 32 (multi-word rows): the searchsorted view must use the same
    row order as sort_rows (regression: the old structured-dtype view
    compared the least-significant word first, mis-assigning counts)."""
    from kmtricks_tpu.core import kmer as kops
    from kmtricks_tpu.runtime.modules import (module_count, module_repart,
                                              module_superk)
    from kmtricks_tpu.io import formats as F
    from kmtricks_tpu.runtime.pipeline import PipelineOptions

    rng = np.random.default_rng(8)
    genome = rng.choice(np.frombuffer(b"ACGT", dtype=np.uint8), size=3000)
    fa = tmp_path / "w.fasta"
    with open(fa, "w") as f:
        for r in range(60):
            start = int(rng.integers(0, len(genome) - 120))
            f.write(f">r{r}\n{bytes(genome[start:start+120]).decode()}\n")
    fof = tmp_path / "w.fof"
    fof.write_text(f"W : {fa}\n")
    k = 47
    opts = PipelineOptions(fof=str(fof), run_dir=str(tmp_path / "run"),
                           kmer_size=k, hard_min=1, soft_min="1",
                           static_repart=True, nb_partitions=4,
                           mode="kmer:count:bin")
    module_repart(opts)
    module_superk(opts.run_dir, "W", opts)
    module_count(opts.run_dir, "W", opts, count_mode="kff-sk")
    module_count(opts.run_dir, "W", opts, count_mode="kmer")

    for p in range(4):
        _, gk, gc = F.read_kmer_file(
            str(tmp_path / "run" / "counts" / f"partition_{p}" / "W.kmer"))
        gvars, blocks = read_kff_sk_file(
            str(tmp_path / "run" / "counts" / f"partition_{p}" / "W.kff"))
        got = {}
        for codes, pos, counts in blocks:
            kk = kops.canonical(kops.kmers_from_codes(codes, k), k)
            for row, c in zip(kk, counts):
                key = row.tobytes()
                assert got.get(key, int(c)) == int(c), "inconsistent count"
                got[key] = int(c)
        exp = {gk[i].tobytes(): int(min(gc[i], 255))
               for i in range(len(gc))}
        assert got == exp
