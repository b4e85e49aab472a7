"""--backend mesh: fused sharded pipeline == host pipeline, byte-for-byte."""

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


@pytest.fixture()
def repart_src(tmp_path):
    import shutil
    d = tmp_path / "repart_src"
    (d / "repartition").mkdir(parents=True)
    shutil.copyfile(REF / "repart_gatb" / "repartition.minimRepart",
                    d / "repartition" / "repartition.minimRepart")
    return str(d)


@pytest.mark.parametrize("mode,extra", [
    ("kmer:count:bin", {}),
    ("hash:bf:bin", {"bloom_size": 1_000_000}),
    ("kmer:pa:bin", {}),
    ("hash:count:bin", {"bloom_size": 1_000_000, "share_min": 1,
                        "soft_min": "2"}),
])
def test_mesh_matches_host(tmp_path, fof_path, repart_src, mode, extra):
    base = dict(fof=fof_path, kmer_size=31, hard_min=1, soft_min="1",
                repart_from=repart_src, mode=mode)
    base.update(extra)
    kh = run_pipeline(PipelineOptions(run_dir=str(tmp_path / "host"),
                                      backend="host", **base))
    km = run_pipeline(PipelineOptions(run_dir=str(tmp_path / "mesh"),
                                      backend="mesh", **base))
    cf, m, _ = mode.split(":")
    for p in range(4):
        a = open(kh.get_matrix_path(p, m, "bin", cf, False), "rb").read()
        b = open(km.get_matrix_path(p, m, "bin", cf, False), "rb").read()
        assert a == b, f"partition {p} matrix differs ({mode})"
        a = open(kh.get_merge_info_path(p)).read()
        b = open(km.get_merge_info_path(p)).read()
        assert a == b, f"partition {p} merge_info differs ({mode})"
        if m == "bf":
            assert (open(kh.get_fpr_path(p)).read()
                    == open(km.get_fpr_path(p)).read())


def test_mesh_float_quantile_writes_hists(tmp_path, fof_path, repart_src):
    """Float-quantile --soft-min implicitly enables histograms on EVERY
    backend: run_pipeline used to dispatch to the mesh backend before
    the implicit --hist enable, so the streaming tail's quantile
    resolution found no hist files (fuzz_backends case 2 / seed 424).
    Hist files AND matrices must byte-match the host backend."""
    base = dict(fof=fof_path, kmer_size=31, hard_min=1, soft_min="0.4",
                share_min=1, repart_from=repart_src, mode="kmer:count:bin")
    kh = run_pipeline(PipelineOptions(run_dir=str(tmp_path / "host"),
                                      backend="host", **base))
    km = run_pipeline(PipelineOptions(run_dir=str(tmp_path / "mesh"),
                                      backend="mesh", **base))
    for s in ("D1", "D2"):
        a = open(kh.get_hist_path(s), "rb").read()
        b = open(km.get_hist_path(s), "rb").read()
        assert a == b, f"hist {s} differs"
    for p in range(4):
        a = open(kh.get_matrix_path(p, "count", "bin", "kmer", False),
                 "rb").read()
        b = open(km.get_matrix_path(p, "count", "bin", "kmer", False),
                 "rb").read()
        assert a == b, f"partition {p} matrix differs"
