"""End-to-end pipeline + module CLI tests on the reference's tests/data.

The contract mirrors the reference's own task tests (tests/task_main.cpp):
run against the committed 2-sample FASTA data with the committed golden
repartition injected, and check byte-level agreement with the committed
count fixtures plus the golden merged row counts 57/67/70/82.
"""

import os
import pathlib
import shutil
import subprocess
import sys

import numpy as np
import pytest

from kmtricks_tpu.io import formats as F
from kmtricks_tpu.runtime.pipeline import PipelineOptions, run_pipeline

REF = pathlib.Path("/root/reference/tests/data")
GOLDEN_ROWS = {0: 57, 1: 67, 2: 70, 3: 82}


@pytest.fixture()
def ref_data():
    if not REF.exists():
        pytest.skip("reference test data not available")
    return REF


@pytest.fixture()
def repart_src(tmp_path, ref_data):
    """A fake prior run dir exposing the committed golden repartition
    (determinism injection, like task_main.cpp:58-62)."""
    d = tmp_path / "repart_src"
    (d / "repartition").mkdir(parents=True)
    shutil.copyfile(ref_data / "repart_gatb" / "repartition.minimRepart",
                    d / "repartition" / "repartition.minimRepart")
    return str(d)


@pytest.fixture()
def fof_path(tmp_path, ref_data):
    p = tmp_path / "test.fof"
    p.write_text(f"D1 : {ref_data}/1.fasta\nD2 : {ref_data}/2.fasta\n")
    return str(p)


def base_opts(tmp_path, fof_path, repart_src, **kw):
    d = dict(fof=fof_path, run_dir=str(tmp_path / "run"),
             kmer_size=31, hard_min=1, repart_from=repart_src,
             soft_min="1", recurrence_min=1, share_min=0)
    d.update(kw)
    return PipelineOptions(**d)


def test_pipeline_kmer_count_bin(tmp_path, fof_path, repart_src, ref_data):
    opts = base_opts(tmp_path, fof_path, repart_src, mode="kmer:count:bin")
    kmdir = run_pipeline(opts)

    # per-sample count files byte-compatible content with reference fixtures
    for sid, name in ((0, "D1"), (1, "D2")):
        for p in range(4):
            _, kk, cc = F.read_kmer_file(
                kmdir.get_count_part_path(name, p, False, "kmer"))
            _, gk, gc = F.read_kmer_file(
                str(ref_data / "partitions" / "kmers" / f"partition_{p}"
                    / f"{name}.kmer"))
            assert (kk == gk).all() and (cc == gc).all()

    for p in range(4):
        _, mk, mc = F.read_matrix_file(
            kmdir.get_matrix_path(p, "count", "bin", "kmer", False))
        assert len(mk) == GOLDEN_ROWS[p]
        assert mc.shape == (GOLDEN_ROWS[p], 2)
        # merge_infos exist
        assert os.path.exists(kmdir.get_merge_info_path(p))
    assert os.path.exists(kmdir.run_infos)


def test_pipeline_hash_bf_bin(tmp_path, fof_path, repart_src, ref_data):
    opts = base_opts(tmp_path, fof_path, repart_src, mode="hash:bf:bin",
                     bloom_size=1_000_000)
    kmdir = run_pipeline(opts)
    from kmtricks_tpu.core.hashers import HashWindow

    hw = HashWindow.load(kmdir.hash_win)
    assert hw.window_size_bits == 250048    # matches hash fixtures
    total_rows = 0
    for p in range(4):
        # hash count files match reference fixtures
        for name in ("D1", "D2"):
            _, hh, cc = F.read_hash_file(
                kmdir.get_count_part_path(name, p, False, "hash"))
            _, gh, gc = F.read_hash_file(
                str(ref_data / "partitions" / "hashes" / f"partition_{p}"
                    / f"{name}.hash"))
            assert (hh == gh).all() and (cc == gc).all()
        info, rows = F.read_vector_matrix_file(
            kmdir.get_matrix_path(p, "bf", "bin", "hash", False))
        assert info.window == hw.window_size_bits
        assert rows.shape == (hw.window_size_bits, 1)
        total_rows += int((rows != 0).any(axis=1).sum())
        assert os.path.exists(kmdir.get_fpr_path(p))
    assert total_rows == sum(GOLDEN_ROWS.values())


def test_pipeline_pa_and_text(tmp_path, fof_path, repart_src):
    opts = base_opts(tmp_path, fof_path, repart_src, mode="kmer:pa:bin")
    kmdir = run_pipeline(opts)
    rows = 0
    for p in range(4):
        info, kk, bb = F.read_pa_matrix_file(
            kmdir.get_matrix_path(p, "pa", "bin", "kmer", False))
        assert info.bits == 2
        rows += len(kk)
    assert rows == sum(GOLDEN_ROWS.values())

    opts2 = base_opts(tmp_path, fof_path, repart_src,
                      mode="kmer:count:text",
                      run_dir=str(tmp_path / "run_text"))
    kmdir2 = run_pipeline(opts2)
    lines = open(kmdir2.get_matrix_path(0, "count", "text", "kmer",
                                        False)).read().splitlines()
    assert len(lines) == GOLDEN_ROWS[0]
    assert all(len(line.split()) == 3 for line in lines)
    assert all(len(line.split()[0]) == 31 for line in lines)


def test_pipeline_bft_and_filters(tmp_path, fof_path, repart_src):
    opts = base_opts(tmp_path, fof_path, repart_src, mode="hash:bft:bin",
                     bloom_size=1_000_000)
    kmdir = run_pipeline(opts)
    from kmtricks_tpu.core.hashers import HashWindow
    from kmtricks_tpu.io.howde import read_bf_file

    hw = HashWindow.load(kmdir.hash_win)
    for name in ("D1", "D2"):
        meta, bits = read_bf_file(kmdir.get_filter_path(name))
        assert meta["numBits"] == hw.bloom_size
        assert meta["smerSize"] == 31
        assert len(bits) == hw.bloom_size // 8
    # cross-check: the union of set bits equals the bf-mode row population
    opts_bf = base_opts(tmp_path, fof_path, repart_src, mode="hash:bf:bin",
                        bloom_size=1_000_000,
                        run_dir=str(tmp_path / "run_bf"))
    kmdir_bf = run_pipeline(opts_bf)
    for s, name in enumerate(("D1", "D2")):
        _, bits = read_bf_file(kmdir.get_filter_path(name))
        got = np.unpackbits(bits, bitorder="little")
        exp = np.zeros(hw.bloom_size, dtype=np.uint8)
        for p in range(4):
            _, rows = F.read_vector_matrix_file(
                kmdir_bf.get_matrix_path(p, "bf", "bin", "hash", False))
            col = (rows[:, s // 8] >> (s % 8)) & 1
            exp[hw.lower(p):hw.lower(p) + hw.window_size_bits] = col
        assert (got[:hw.bloom_size] == exp).all()


def test_pipeline_hash_mode_with_cpr(tmp_path, fof_path, repart_src,
                                     ref_data):
    """--cpr with hash mode: per-sample files are `.hash.p4` (p4nd1/p4nz
    codec, hash_file.hpp:100-131) and decode to the same hash/count
    streams as the reference's uncompressed fixtures."""
    opts = base_opts(tmp_path, fof_path, repart_src, mode="hash:count:bin",
                     bloom_size=1_000_000)
    opts.cpr = True
    kmdir = run_pipeline(opts)
    total = 0
    for p in range(4):
        for name in ("D1", "D2"):
            path = kmdir.get_count_part_path(name, p, True, "hash")
            assert path.endswith(".hash.p4") and os.path.exists(path)
            _, hh, cc = F.read_hash_file(path)
            _, gh, gc = F.read_hash_file(
                str(ref_data / "partitions" / "hashes" / f"partition_{p}"
                    / f"{name}.hash"))
            assert (hh == gh).all() and (cc == gc).all()
        path = kmdir.get_matrix_path(p, "count", "bin", "hash", True)
        assert path.endswith(".count_hash.lz4")
        _, hh, cc = F.read_matrix_hash_file(path)
        total += len(hh)
    assert total == sum(GOLDEN_ROWS.values())


def test_module_flow_matches_pipeline(tmp_path, fof_path, repart_src):
    """repart -> superk -> count (from superkmers) -> merge == pipeline."""
    from kmtricks_tpu.runtime.modules import (
        module_count, module_merge, module_repart, module_superk)

    opts = base_opts(tmp_path, fof_path, repart_src, mode="kmer:count:bin",
                     run_dir=str(tmp_path / "mods"))
    module_repart(opts)
    for name in ("D1", "D2"):
        module_superk(opts.run_dir, name, opts)
        assert os.path.exists(
            tmp_path / "mods" / "superkmers" / name / "skp.0")
        assert os.path.exists(
            tmp_path / "mods" / "superkmers" / name / "SuperKmerBinInfoFile")
        assert os.path.exists(
            tmp_path / "mods" / "partition_infos" / f"{name}.pinfo")
        module_count(opts.run_dir, name, opts)
    module_merge(opts.run_dir, opts)

    ref_opts = base_opts(tmp_path, fof_path, repart_src,
                         mode="kmer:count:bin",
                         run_dir=str(tmp_path / "ref_run"))
    ref_kmdir = run_pipeline(ref_opts)
    for p in range(4):
        a = open(os.path.join(str(tmp_path / "mods"), "matrices",
                              f"matrix_{p}.count"), "rb").read()
        b = open(ref_kmdir.get_matrix_path(p, "count", "bin", "kmer",
                                           False), "rb").read()
        assert a == b, f"partition {p}: module flow != pipeline"


def test_gatb_layout_run_dir(tmp_path, fof_path, repart_src, ref_data):
    """Modules consume a reference-layout run dir (config_gatb/gatb.config +
    repartition_gatb/) and our runs write the GATB config twin."""
    import shutil

    from kmtricks_tpu.runtime.config import load_gatb_config
    from kmtricks_tpu.runtime.modules import load_run, module_count, \
        module_merge
    from kmtricks_tpu.runtime.pipeline import PipelineOptions

    # our pipeline writes the twin
    opts = base_opts(tmp_path, fof_path, repart_src, mode="kmer:count:bin")
    kmdir = run_pipeline(opts)
    g = load_gatb_config(kmdir.root)
    assert g.kmer_size == 31 and g.nb_partitions == 4

    # synthesize a reference-layout dir: GATB config + repartition_gatb
    ref_run = tmp_path / "gatb_run"
    ref_run.mkdir()
    shutil.copyfile(pathlib.Path(fof_path), ref_run / "kmtricks.fof")
    shutil.copytree(kmdir.root + "/config_gatb", ref_run / "config_gatb")
    (ref_run / "repartition_gatb").mkdir()
    shutil.copyfile(REF / "repart_gatb" / "repartition.minimRepart",
                    ref_run / "repartition_gatb" / "repartition.minimRepart")
    for sub in ("counts", "matrices", "merge_infos", "superkmers",
                "histograms", "partition_infos", "fpr"):
        (ref_run / sub).mkdir()
    for p in range(4):
        (ref_run / "counts" / f"partition_{p}").mkdir()

    kd, cfg, rep = load_run(str(ref_run))
    assert cfg.kmer_size == 31 and rep is not None

    mopts = PipelineOptions(run_dir=str(ref_run), kmer_size=31, hard_min=1,
                            soft_min="1", mode="kmer:count:bin")
    for name in ("D1", "D2"):
        module_count(str(ref_run), name, mopts)
    module_merge(str(ref_run), mopts)
    for p in range(4):
        a = open(ref_run / "matrices" / f"matrix_{p}.count", "rb").read()
        b = open(kmdir.get_matrix_path(p, "count", "bin", "kmer", False),
                 "rb").read()
        assert a == b


def run_cli(*args):
    return subprocess.run(
        [sys.executable, "-m", "kmtricks_tpu", *map(str, args)],
        capture_output=True, text=True, cwd="/root/repo",
        env={**os.environ, "JAX_PLATFORMS": "cpu"})


def test_cli_pipeline_dump_aggregate(tmp_path, fof_path, repart_src):
    run = tmp_path / "cli_run"
    r = run_cli("pipeline", "--file", fof_path, "--run-dir", run,
                "--kmer-size", 31, "--hard-min", 1, "--soft-min", 1,
                "--repart-from", repart_src, "--mode", "kmer:count:bin",
                "--hist")
    assert r.returncode == 0, r.stderr
    r = run_cli("dump", run / "matrices" / "matrix_0.count")
    assert r.returncode == 0, r.stderr
    assert len(r.stdout.splitlines()) == GOLDEN_ROWS[0]
    r = run_cli("dump", run / "histograms" / "D1.hist")
    assert r.returncode == 0, r.stderr
    assert r.stdout.startswith("@LOWER=1")
    r = run_cli("aggregate", "--run-dir", run, "--matrix", "kmer",
                "--sorted", "--format", "text")
    assert r.returncode == 0, r.stderr
    lines = r.stdout.splitlines()
    assert len(lines) == sum(GOLDEN_ROWS.values())
    kmers = [line.split()[0] for line in lines]
    from kmtricks_tpu.core.kmer import strings_to_kmers
    packed = strings_to_kmers(kmers, 31)[:, 0]
    assert (np.diff(packed.astype(np.int64)) > 0).all()   # sorted, distinct
    r = run_cli("infos")
    assert r.returncode == 0 and "kmtricks_tpu" in r.stdout


def test_combine_and_filter(tmp_path, fof_path, repart_src, ref_data):
    from kmtricks_tpu.runtime.combine import module_combine
    from kmtricks_tpu.runtime.filter import module_filter

    run1 = str(tmp_path / "c1")
    run2 = str(tmp_path / "c2")
    for rd in (run1, run2):
        run_pipeline(base_opts(tmp_path, fof_path, repart_src,
                               mode="kmer:count:bin", run_dir=rd))
    out = str(tmp_path / "combined")
    module_combine([run1, run2], out)
    for p in range(4):
        _, kk, cc = F.read_matrix_file(
            os.path.join(out, "matrices", f"matrix_{p}.count"))
        assert len(kk) == GOLDEN_ROWS[p]      # same rows, 4 columns
        assert cc.shape[1] == 4
        assert (cc[:, :2] == cc[:, 2:]).all()

    # filter run1's matrix with D1 as key: every D1 k-mer is in the matrix
    key_fof = tmp_path / "key.fof"
    key_fof.write_text(f"K1 : {ref_data}/1.fasta\n")
    fout = str(tmp_path / "filtered")
    module_filter(run1, str(key_fof), fout, hard_min=1)
    total = 0
    for p in range(4):
        _, mk, mc = F.read_matrix_file(
            os.path.join(fout, "matrices", f"matrix_{p}.count"))
        assert mc.shape[1] == 3               # key column appended
        total += len(mk)
        vec = open(os.path.join(fout, "matrices", f"{p}.vec")
                   ).read().splitlines()
        assert len(vec) == GOLDEN_ROWS[p]
        # absent-key-kmer files: D1 ⊂ matrix → empty
        _, ak, ac = F.read_kmer_file(
            os.path.join(fout, "counts", f"partition_{p}", "K1.kmer"))
        assert len(ak) == 0
    assert total > 0
