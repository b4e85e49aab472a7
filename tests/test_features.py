"""Feature tests: BAM input, plugins, KFF output, device backend, banks."""

import gzip
import os
import pathlib

import numpy as np
import pytest

from kmtricks_tpu.io import formats as F
from kmtricks_tpu.io import sequences as seqio
from kmtricks_tpu.runtime.pipeline import PipelineOptions, run_pipeline

REF = pathlib.Path("/root/reference")
GOLDEN_ROWS = {0: 57, 1: 67, 2: 70, 3: 82}


@pytest.fixture()
def ref_data():
    if not REF.exists():
        pytest.skip("reference not available")
    return REF / "tests" / "data"


@pytest.fixture()
def repart_src(tmp_path, ref_data):
    import shutil
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


# ---------------------------------------------------------------------------
# BAM (fork addition; reference tests/bam_test.cpp)
# ---------------------------------------------------------------------------

def test_bam_matches_fasta(ref_data):
    bam = REF / "test.bam"
    if not bam.exists():
        pytest.skip("test.bam not available")
    assert seqio.sniff_format(str(bam)) == "bam"
    bam_seqs = [s for _, s in seqio.iter_bam(str(bam))]
    fa_seqs = [s for _, s in seqio.iter_fasta(str(ref_data / "1.fasta"))]
    assert bam_seqs == fa_seqs


def test_bam_flag_filters(ref_data):
    bam = REF / "test.bam"
    if not bam.exists():
        pytest.skip("test.bam not available")
    total = len(list(seqio.iter_bam(str(bam))))
    # 0x4 = unmapped; requiring it should drop mapped reads
    req = len(list(seqio.iter_bam(
        str(bam), seqio.BamFilter(require_flags=0x4))))
    exc = len(list(seqio.iter_bam(
        str(bam), seqio.BamFilter(exclude_flags=0x4))))
    assert req + exc == total


def _bgzf_member(payload: bytes) -> bytes:
    """One BGZF member: gzip header with the 'BC' total-size extra
    subfield, raw-deflate payload, crc32+isize trailer."""
    import struct
    import zlib

    co = zlib.compressobj(6, zlib.DEFLATED, -15)
    comp = co.compress(payload) + co.flush()
    bsize = 18 + len(comp) + 8
    hdr = b"\x1f\x8b\x08\x04" + b"\x00" * 6 + struct.pack("<H", 6) \
        + b"BC" + struct.pack("<HH", 2, bsize - 1)
    return hdr + comp + struct.pack("<II", zlib.crc32(payload) & 0xFFFFFFFF,
                                    len(payload) & 0xFFFFFFFF)


def _bgzf_compress(raw: bytes, member_payload: int = 1024) -> bytes:
    """BGZF-frame ``raw`` into ~member_payload-byte members + EOF member."""
    out = [_bgzf_member(raw[i:i + member_payload])
           for i in range(0, len(raw), member_payload)]
    out.append(_bgzf_member(b""))      # BGZF EOF marker
    return b"".join(out)


def _bam_bytes(refs, records, bgzf=False):
    """Minimal in-memory BAM stream: (name, seq, flag, ref_id) records.
    gzip-compressed single member by default (our reader is
    member-transparent); ``bgzf=True`` frames it as real BGZF members,
    exercising the parallel member-inflate path."""
    import struct

    enc = {c: i for i, c in enumerate(b"=ACMGRSVTWYHKDBN")}
    out = [b"BAM\x01", struct.pack("<i", 0), struct.pack("<i", len(refs))]
    for r in refs:
        nm = r.encode() + b"\x00"
        out += [struct.pack("<i", len(nm)), nm, struct.pack("<i", 1000)]
    for name, seq, flag, ref_id in records:
        nm = name + b"\x00"
        nibs = [enc[c] for c in seq]
        if len(nibs) % 2:
            nibs.append(0)
        packed = bytes((nibs[i] << 4) | nibs[i + 1]
                       for i in range(0, len(nibs), 2))
        block = struct.pack("<iiBBHHHiiii", ref_id, 0, len(nm), 0, 0, 0,
                            flag, len(seq), -1, -1, 0)
        block += nm + packed + b"\xff" * len(seq)
        out += [struct.pack("<i", len(block)), block]
    raw = b"".join(out)
    return _bgzf_compress(raw) if bgzf else gzip.compress(raw)


def test_bam_synthetic_semantics(tmp_path):
    """Revcomp-back, secondary/supplementary skip, -f/-F, excluded refs —
    on a hand-built BAM (BankBam.cpp:440-550 semantics)."""
    bam = tmp_path / "s.bam"
    bam.write_bytes(_bam_bytes(
        ["chr1", "chr2"],
        [(b"r1", b"ACGTN", 0, 0),
         (b"r2", b"AACCGG", 0x10, 1),      # reverse strand: stored revcomp
         (b"r3", b"TTTT", 0x100, 0),       # secondary: always skipped
         (b"r4", b"GGGG", 0x800, 0),       # supplementary: always skipped
         (b"r5", b"CCAA", 0x4, -1),        # unmapped
         (b"r6", b"ACMGRSVTWYHKDBN=", 0, 0)]))   # every nibble code
    assert seqio.sniff_format(str(bam)) == "bam"
    got = list(seqio.iter_bam(str(bam)))
    assert got == [(b"r1", b"ACGTN"),
                   (b"r2", b"CCGGTT"),     # revcomp'd back
                   (b"r5", b"CCAA"),
                   (b"r6", b"ACMGRSVTWYHKDBN=")]
    # -f / -F
    assert [n for n, _ in seqio.iter_bam(
        str(bam), seqio.BamFilter(require_flags=0x4))] == [b"r5"]
    assert [n for n, _ in seqio.iter_bam(
        str(bam), seqio.BamFilter(exclude_flags=0x4))] == [b"r1", b"r2",
                                                           b"r6"]
    # excluded references (unmapped ref_id=-1 never excluded)
    assert [n for n, _ in seqio.iter_bam(
        str(bam), seqio.BamFilter(excluded_refs=frozenset({"chr1"})))] \
        == [b"r2", b"r5"]


def test_bgzf_parallel_reader(tmp_path, monkeypatch):
    """BGZF-framed BAM through the parallel member-inflate reader ==
    plain-gzip BAM through the serial gzip module, on every path
    (iterator, load_batch, tiny-segment streaming — tiny compressed
    groups force member carry across _fill_once calls)."""
    rng = np.random.default_rng(11)
    refs = ["chr1"]
    records = [(b"r%d" % i,
                bytes(rng.choice(np.frombuffer(b"ACGT", dtype=np.uint8),
                                 size=int(rng.integers(30, 120)))),
                int(rng.choice([0, 0x10])), 0) for i in range(300)]
    gz = tmp_path / "a.bam"
    bz = tmp_path / "b.bam"
    gz.write_bytes(_bam_bytes(refs, records))
    bz.write_bytes(_bam_bytes(refs, records, bgzf=True))

    from kmtricks_tpu.io.sequences import (_BgzfParallelFile,
                                           _open_bam_stream)
    assert isinstance(_open_bam_stream(str(bz)), _BgzfParallelFile)
    assert not isinstance(_open_bam_stream(str(gz)), _BgzfParallelFile)
    assert seqio.sniff_format(str(bz)) == "bam"

    assert list(seqio.iter_bam(str(bz))) == list(seqio.iter_bam(str(gz)))

    b1, l1 = seqio.load_batch(str(gz))
    b2, l2 = seqio.load_batch(str(bz))
    assert np.array_equal(l1, l2) and np.array_equal(b1, b2)

    # tiny compressed read groups: members split across fills
    f = _BgzfParallelFile(str(bz), group_bytes=100)
    whole = f.read()
    f.close()
    with gzip.open(gz) as g:
        assert whole == g.read()

    got = [r for r in seqio.iter_batches(str(bz), segment_bytes=512)]
    want = [r for r in seqio.iter_batches(str(gz), segment_bytes=512)]
    assert len(got) == len(want)
    for (gb, gl), (wb, wl) in zip(got, want):
        assert np.array_equal(gl, wl) and np.array_equal(gb, wb)

    # truncated BGZF member -> error, not silent truncation
    bad = tmp_path / "t.bam"
    bad.write_bytes(bz.read_bytes()[:-40])
    with pytest.raises(EOFError):
        _BgzfParallelFile(str(bad)).read()


@pytest.mark.parametrize("filt", [
    None,
    dict(require_flags=0x10),
    dict(exclude_flags=0x10),
    dict(excluded_refs=frozenset({"chr2"})),
])
def test_bam_native_batch_matches_iterator(tmp_path, filt):
    """load_batch (native km_bam_batch) == the Python record iterator,
    rows and lengths, under every filter kind."""
    from kmtricks_tpu import native

    if native.lib() is None:
        pytest.skip("native lib unavailable")
    rng = np.random.default_rng(5)
    refs = ["chr1", "chr2"]
    records = []
    for i in range(200):
        seq = bytes(rng.choice(np.frombuffer(b"ACGTN", dtype=np.uint8),
                               size=int(rng.integers(1, 80))))
        flag = int(rng.choice([0, 0x10, 0x100, 0x800, 0x4, 0x14]))
        records.append((b"r%d" % i, seq, flag,
                        int(rng.integers(-1, len(refs)))))
    bam = tmp_path / "n.bam"
    bam.write_bytes(_bam_bytes(refs, records))
    bf = seqio.BamFilter(**filt) if filt else None

    want = [s for _, s in seqio.iter_bam(str(bam), bf)]
    batch, lengths = seqio.load_batch(str(bam), bam_filter=bf)
    assert len(lengths) == len(want)
    for i, s in enumerate(want):
        assert lengths[i] == len(s)
        assert batch[i, :len(s)].tobytes() == s
        assert (batch[i, len(s):] == ord("N")).all()

    # streaming path: tiny segments force multi-batch + record carry
    rows = 0
    for b2, l2 in seqio.iter_batches(str(bam), bam_filter=bf,
                                     segment_bytes=256):
        for j in range(len(l2)):
            s = want[rows + j]
            assert l2[j] == len(s)
            assert b2[j, :len(s)].tobytes() == s
        rows += len(l2)
    assert rows == len(want)


def test_sniff_formats(tmp_path):
    fa = tmp_path / "a.fa"
    fa.write_text(">r1\nACGT\n")
    fq = tmp_path / "a.fq"
    fq.write_text("@r1\nACGT\n+\nIIII\n")
    gz = tmp_path / "a.fa.gz"
    with gzip.open(gz, "wt") as f:
        f.write(">r1\nACGTACGT\n")
    assert seqio.sniff_format(str(fa)) == "fasta"
    assert seqio.sniff_format(str(fq)) == "fastq"
    assert seqio.sniff_format(str(gz)) == "fasta"
    assert [s for _, s in seqio.iter_bank(str(gz))] == [b"ACGTACGT"]
    assert [s for _, s in seqio.iter_bank(str(fq))] == [b"ACGT"]


# ---------------------------------------------------------------------------
# Plugins
# ---------------------------------------------------------------------------

PLUGIN_SRC = '''
import numpy as np
from kmtricks_tpu.runtime.plugin import MergePlugin

class MinAll(MergePlugin):
    """Keep rows where every sample count >= threshold (basic_ex.cpp)."""
    def configure(self, s):
        self.threshold = int(s)
    def process_kmer(self, kmer_data, counts):
        return bool((counts >= self.threshold).all())
'''


def test_merge_plugin(tmp_path, fof_path, repart_src):
    plug = tmp_path / "plug.py"
    plug.write_text(PLUGIN_SRC)
    base = dict(fof=fof_path, kmer_size=31, hard_min=1, soft_min="1",
                repart_from=repart_src, mode="kmer:count:bin")
    k_ref = run_pipeline(PipelineOptions(
        run_dir=str(tmp_path / "noplug"), **base))
    k_plug = run_pipeline(PipelineOptions(
        run_dir=str(tmp_path / "plug"), plugin=f"{plug}:MinAll",
        plugin_config="1", **base))
    total_ref = total_plug = expected = 0
    for p in range(4):
        _, mk, mc = F.read_matrix_file(
            k_ref.get_matrix_path(p, "count", "bin", "kmer", False))
        _, pk, pc = F.read_matrix_file(
            k_plug.get_matrix_path(p, "count", "bin", "kmer", False))
        total_ref += len(mk)
        total_plug += len(pk)
        expected += int((mc >= 1).all(axis=1).sum())
        assert (pc >= 1).all()       # plugin kept only all-present rows
    assert total_ref == sum(GOLDEN_ROWS.values())
    assert total_plug == expected    # veto applied row-exactly


def test_example_plugins(tmp_path, fof_path, repart_src):
    """The shipped examples/plugins/ load and apply their documented
    semantics (basic: all counts >= threshold; template: only rows whose
    k-mer starts with 'A' are filtered)."""
    import pathlib

    from kmtricks_tpu.core.kmer import kmers_to_strings

    ex = pathlib.Path(__file__).resolve().parents[1] / "examples" / "plugins"
    base = dict(fof=fof_path, kmer_size=31, hard_min=1, soft_min="1",
                repart_from=repart_src, mode="kmer:count:bin")
    ref = run_pipeline(PipelineOptions(run_dir=str(tmp_path / "ref"), **base))
    basic = run_pipeline(PipelineOptions(
        run_dir=str(tmp_path / "basic"),
        plugin=f"{ex / 'basic_ex.py'}:BasicEx", plugin_config="2", **base))
    tmpl = run_pipeline(PipelineOptions(
        run_dir=str(tmp_path / "tmpl"),
        plugin=str(ex / "template_ex.py"), plugin_config="2", **base))
    for p in range(4):
        _, mk, mc = F.read_matrix_file(
            ref.get_matrix_path(p, "count", "bin", "kmer", False))
        _, bk, bc = F.read_matrix_file(
            basic.get_matrix_path(p, "count", "bin", "kmer", False))
        _, tk, tc = F.read_matrix_file(
            tmpl.get_matrix_path(p, "count", "bin", "kmer", False))
        keep_basic = (mc >= 2).all(axis=1)
        assert len(bk) == int(keep_basic.sum())
        starts_a = np.array([s[0] == "A"
                             for s in kmers_to_strings(mk, 31)])
        keep_tmpl = ~starts_a | keep_basic
        assert len(tk) == int(keep_tmpl.sum())


# ---------------------------------------------------------------------------
# KFF
# ---------------------------------------------------------------------------

def test_kff_output(tmp_path, fof_path, repart_src):
    from kmtricks_tpu.core.kmer import kmers_to_strings
    from kmtricks_tpu.io.kff import read_kff_file

    kmdir = run_pipeline(PipelineOptions(
        fof=fof_path, run_dir=str(tmp_path / "kffrun"), kmer_size=31,
        hard_min=1, repart_from=repart_src, mode="kmer:count:bin",
        until="count", kff=True))
    for p in range(4):
        _, kk, cc = F.read_kmer_file(
            kmdir.get_count_part_path("D1", p, False, "kmer"))
        gvars, rows = read_kff_file(
            kmdir.get_count_part_path("D1", p, False, "kff"))
        assert gvars["k"] == 31 and gvars["data_size"] == 4
        assert [r[0] for r in rows] == kmers_to_strings(kk, 31)
        assert [r[1] for r in rows] == [int(c) for c in cc]


# ---------------------------------------------------------------------------
# Device backend end-to-end parity
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("mode", ["kmer:count:bin", "hash:bf:bin"])
def test_pipeline_device_backend(tmp_path, fof_path, repart_src, mode):
    base = dict(fof=fof_path, kmer_size=31, hard_min=1, soft_min="1",
                repart_from=repart_src, mode=mode, bloom_size=1_000_000)
    kh = run_pipeline(PipelineOptions(
        run_dir=str(tmp_path / "host"), backend="host", **base))
    kd = run_pipeline(PipelineOptions(
        run_dir=str(tmp_path / "dev"), backend="device", **base))
    cf, m, _ = mode.split(":")
    for p in range(4):
        a = open(kh.get_matrix_path(p, m, "bin", cf, False), "rb").read()
        b = open(kd.get_matrix_path(p, m, "bin", cf, False), "rb").read()
        assert a == b, f"partition {p}: device != host ({mode})"


def test_bf_from_vectors_matches_bft(tmp_path, fof_path, repart_src):
    """count --mode vector per-partition vectors -> per-sample BF
    (BloomBuilderFromVec) equals the bft transpose route."""
    from kmtricks_tpu.io.howde import read_bf_file
    from kmtricks_tpu.runtime.modules import load_run, module_count
    from kmtricks_tpu.runtime.pipeline import build_bf_from_vectors

    kbft = run_pipeline(PipelineOptions(
        fof=fof_path, run_dir=str(tmp_path / "bft"), kmer_size=31,
        hard_min=1, soft_min="1", repart_from=repart_src,
        mode="hash:bft:bin", bloom_size=1_000_000))

    kvec_dir = str(tmp_path / "vec")
    run_pipeline(PipelineOptions(
        fof=fof_path, run_dir=kvec_dir, kmer_size=31, hard_min=1,
        repart_from=repart_src, mode="hash:count:bin",
        bloom_size=1_000_000, until="count"))
    opts = PipelineOptions(run_dir=kvec_dir, kmer_size=31, hard_min=1,
                           mode="hash:count:bin")
    kmdir, config, _rep = load_run(kvec_dir)
    for name in ("D1", "D2"):
        module_count(kvec_dir, name, opts, count_mode="vector")
        out = build_bf_from_vectors(kmdir, config, name)
        _, bits_vec = read_bf_file(out)
        _, bits_bft = read_bf_file(kbft.get_filter_path(name))
        assert (np.asarray(bits_vec) == np.asarray(bits_bft)).all(), name


@pytest.mark.parametrize("k", [96, 127])
def test_host_large_k(k):
    """k > 64 host path: canonical sets are strand-invariant and counted
    consistently (multi-word Kmer<96>/Kmer<128> spans)."""
    from kmtricks_tpu.core import kmer as kops
    from kmtricks_tpu.core.repartition import Repartition
    from kmtricks_tpu.host.ops import count_sequences

    rng = np.random.default_rng(k)
    reads = [bytes(rng.choice(np.frombuffer(b"ACGT", dtype=np.uint8),
                              size=200)) for _ in range(6)]
    comp = bytes.maketrans(b"ACGT", b"TGCA")
    rc_reads = [r[::-1].translate(comp) for r in reads]
    rep = Repartition.from_xxh(4, 10)
    a = count_sequences(reads, k, 10, rep.table, hard_min=1)
    b = count_sequences(rc_reads, k, 10, rep.table, hard_min=1)
    all_a = np.concatenate([a.partitions[p][0] for p in range(4)
                            if p in a.partitions])
    all_b = np.concatenate([b.partitions[p][0] for p in range(4)
                            if p in b.partitions])
    va = {tuple(int(w) for w in row) for row in all_a}
    vb = {tuple(int(w) for w in row) for row in all_b}
    assert va == vb                      # canonical => strand-invariant
    assert all_a.shape[1] == (k + 31) // 32
    # string roundtrip at this k
    s = kops.kmers_to_strings(all_a[:5], k)
    assert (kops.strings_to_kmers(s, k) == all_a[:5]).all()
