"""CLI option semantics: --until, restrict lists, run-dir artifacts."""

import os
import pathlib

import pytest

from kmtricks_tpu.runtime.pipeline import PipelineOptions, run_pipeline

REF = pathlib.Path("/root/reference/tests/data")


@pytest.fixture()
def fof_path(tmp_path):
    if not REF.exists():
        pytest.skip("reference data not available")
    p = tmp_path / "t.fof"
    p.write_text(f"D1 : {REF}/1.fasta\nD2 : {REF}/2.fasta\n")
    return str(p)


def opts(tmp_path, fof_path, name, **kw):
    d = dict(fof=fof_path, run_dir=str(tmp_path / name), kmer_size=31,
             hard_min=1, soft_min="1", static_repart=True, nb_partitions=4)
    d.update(kw)
    return PipelineOptions(**d)


def test_until_repart(tmp_path, fof_path):
    kmdir = run_pipeline(opts(tmp_path, fof_path, "r", until="repart"))
    assert os.path.exists(kmdir.repart_path)
    assert os.path.exists(kmdir.hash_win)
    assert os.path.exists(kmdir.options_path)
    assert os.path.exists(kmdir.run_infos)
    assert not os.listdir(kmdir.matrix_storage)
    # minimizer dump (m <= 12, task.hpp:160-168)
    assert os.path.exists(f"{kmdir.minimizer_storage}/minimizers.0")


def test_until_count_and_restrict_list(tmp_path, fof_path):
    kmdir = run_pipeline(opts(tmp_path, fof_path, "c", until="count",
                              restrict_to_list=[1, 3]))
    for p in (1, 3):
        assert os.path.exists(kmdir.get_count_part_path("D1", p, False,
                                                        "kmer"))
    for p in (0, 2):
        assert not os.path.exists(kmdir.get_count_part_path("D1", p, False,
                                                            "kmer"))
    assert not os.listdir(kmdir.matrix_storage)


def test_restrict_list_merge(tmp_path, fof_path):
    kmdir = run_pipeline(opts(tmp_path, fof_path, "m",
                              restrict_to_list=[2]))
    assert os.path.exists(kmdir.get_matrix_path(2, "count", "bin", "kmer",
                                                False))
    assert not os.path.exists(kmdir.get_matrix_path(0, "count", "bin",
                                                    "kmer", False))


def test_bf_requires_all_partitions(tmp_path, fof_path):
    with pytest.raises(ValueError):
        run_pipeline(opts(tmp_path, fof_path, "bf", mode="hash:bf:bin",
                          restrict_to_list=[0]))


def test_until_superk_writes_skp(tmp_path, fof_path):
    kmdir = run_pipeline(opts(tmp_path, fof_path, "sk", until="superk"))
    for name in ("D1", "D2"):
        assert os.path.exists(
            os.path.join(kmdir.get_superk_path(name), "skp.0"))
        assert os.path.exists(
            os.path.join(kmdir.get_superk_path(name), "PartiInfoFile"))


def test_threads_parallel_equals_serial(tmp_path, fof_path):
    serial = run_pipeline(opts(tmp_path, fof_path, "t1"))
    para = run_pipeline(opts(tmp_path, fof_path, "t4", threads=4))
    for p in range(4):
        a = open(serial.get_matrix_path(p, "count", "bin", "kmer", False),
                 "rb").read()
        b = open(para.get_matrix_path(p, "count", "bin", "kmer", False),
                 "rb").read()
        assert a == b


def test_superk_cpr_roundtrip(tmp_path, fof_path):
    """skp.P with the post-header lz4 frame: module flow stays byte-equal."""
    from kmtricks_tpu.runtime.modules import (
        module_count, module_merge, module_repart, module_superk)

    o1 = opts(tmp_path, fof_path, "plain", until="all")
    ref = run_pipeline(o1)

    o2 = opts(tmp_path, fof_path, "cprmods")
    o2.cpr = False   # count/matrix files plain; only superk uses cpr below
    module_repart(o2)
    for name in ("D1", "D2"):
        sk = opts(tmp_path, fof_path, "cprmods")
        sk.cpr = True
        sk.run_dir = o2.run_dir
        module_superk(o2.run_dir, name, sk)
        module_count(o2.run_dir, name, o2)
    module_merge(o2.run_dir, o2)
    for p in range(4):
        a = open(ref.get_matrix_path(p, "count", "bin", "kmer", False),
                 "rb").read()
        b = open(os.path.join(o2.run_dir, "matrices",
                              f"matrix_{p}.count"), "rb").read()
        assert a == b


def test_cli_count_module_without_superk(tmp_path, fof_path):
    """`count --mode kmer` directly from reads (no superk stage) via the
    CLI's bare-token mode — regression for the parse_mode crash."""
    import subprocess
    import sys

    run = tmp_path / "modrun"
    from kmtricks_tpu.runtime.modules import module_repart
    module_repart(opts(tmp_path, fof_path, "modrun"))
    r = subprocess.run(
        [sys.executable, "-m", "kmtricks_tpu", "count", "--run-dir",
         str(run), "--id", "D1", "--mode", "kmer", "--hard-min", "1"],
        capture_output=True, text=True, cwd="/root/repo",
        env={**os.environ, "JAX_PLATFORMS": "cpu"})
    assert r.returncode == 0, r.stderr
    assert os.path.exists(run / "counts" / "partition_0" / "D1.kmer")


def test_pinfo_counts_match_occurrences(tmp_path, fof_path):
    """PartiInfo per-partition k-mer totals (superk) == total k-mer
    occurrences routed to each partition (count), like the reference's
    PartiInfo-driven allocation contract."""
    import numpy as np

    from kmtricks_tpu.core.repartition import Repartition
    from kmtricks_tpu.host.ops import count_sequences
    from kmtricks_tpu.io.sequences import iter_sequences
    from kmtricks_tpu.runtime.modules import load_run, module_repart, \
        module_superk
    from kmtricks_tpu.runtime.superk import PartiInfo

    o = opts(tmp_path, fof_path, "pinfo")
    module_repart(o)
    module_superk(o.run_dir, "D1", o)
    kmdir, config, rep = load_run(o.run_dir)
    pinfo = PartiInfo.load(kmdir.get_superk_path("D1"))

    seqs = list(iter_sequences(kmdir.fof.get_files("D1")))
    sc = count_sequences(seqs, config.kmer_size, config.minim_size,
                         rep.table, hard_min=1)
    for p in range(config.nb_partitions):
        kk, cc = sc.partitions.get(p, (None, np.zeros(0, np.uint32)))
        occurrences = int(np.asarray(cc, dtype=np.int64).sum())
        assert pinfo.get_nb_kmer(p) == occurrences, p
    # kx-mer radix totals sum to the same k-mer totals
    per_rad = pinfo.nbk_per_radix * (np.arange(5)[None, :, None] + 1)
    assert (per_rad.sum(axis=(1, 2)) == pinfo.part_nb_kmers).all()


def test_gatb_config_twin_byte_layout(tmp_path):
    """The gatb.config twin matches Configuration::save's exact byte
    layout (Configuration.cpp:145-175 / Configuration.hpp:56-100):
    4 size_t + u64 + u32 + 3 size_t + size_t + 3 u64 + 3 u64 + 2 u32 +
    2 u16 + u32 = 140 bytes, raw consecutive little-endian writes."""
    import struct

    from kmtricks_tpu.runtime.config import (Config, load_gatb_config,
                                             save_gatb_config)

    cfg = Config(kmer_size=31, minim_size=10, nb_partitions=8,
                 max_memory_mb=5000, seq_number=123, seq_total_size=45600,
                 seq_max_size=700, kmers_estimated=41900,
                 repart_type=1, minim_type=0,
                 extra={"gatb_plan": {"max_disk_mb": 115401,
                                      "nb_parallel": 2,
                                      "cores_per_partition": 3,
                                      "available_space": 117401,
                                      "volume": 77,
                                      "nb_passes": 4,
                                      "nb_cached_items_per_core_per_part":
                                      8388608}})
    save_gatb_config(cfg, str(tmp_path))
    raw = open(tmp_path / "config_gatb" / "gatb.config", "rb").read()
    assert len(raw) == 140
    vals = struct.unpack("<QQQQQIQQQQQQQQQQIIHHI", raw)
    assert vals[0] == 31 and vals[1] == 10          # kmer, minim
    assert vals[2] == 1 and vals[3] == 0            # repart, minim type
    assert vals[4] == 115401 and vals[5] == 5000    # max_disk, max_memory
    assert vals[7] == 2                             # nb_partitions_in_par
    assert vals[9] == 3                             # nbCores_per_partition
    assert vals[10] == 123 and vals[11] == 45600 and vals[12] == 700
    assert vals[13] == 117401 and vals[14] == 77    # avail, volume
    assert vals[15] == 41900                        # kmersNb
    assert vals[16] == 4 and vals[17] == 8          # passes, partitions
    # bits/kmer = Type::getSize() of the DISPATCHED span (2*32 for k=31),
    # not 2*k — executed-golden-verified (test_ref_exec_golden.py)
    assert vals[18] == 64 and vals[19] == 1         # bits/kmer, nb_banks
    assert vals[20] == 8388608                      # cached items

    back = load_gatb_config(str(tmp_path))
    assert back.kmer_size == 31 and back.nb_partitions == 8
    assert back.seq_number == 123 and back.kmers_estimated == 41900
