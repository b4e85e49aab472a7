"""Unit tests mirroring the reference's remaining unit suites:
bit_matrix_test, packc_test, histogram_test, repartition_test, fof parsing,
album banks (tests/*.cpp of the reference)."""

import numpy as np
import pytest

from kmtricks_tpu.core.bitmatrix import transpose_bits, transpose_bits_device
from kmtricks_tpu.core.histogram import KHist, compute_merge_thresholds
from kmtricks_tpu.core.repartition import Repartition
from kmtricks_tpu.host.ops import pack_counting_bf
from kmtricks_tpu.io import formats as F
from kmtricks_tpu.io.fof import Fof


# ---------------------------------------------------------------------------
# bit matrix transpose (bitmatrix.hpp __sse_trans semantics)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("n,bits", [(16, 8), (64, 24), (100, 3), (8, 128)])
def test_transpose_bits(n, bits):
    rng = np.random.default_rng(0)
    nb = (bits + 7) // 8
    rows = rng.integers(0, 256, (n, nb), dtype=np.uint8)
    t = transpose_bits(rows)
    n8 = ((n + 7) // 8) * 8
    assert t.shape == (nb * 8, n8 // 8)
    a = np.unpackbits(rows, axis=1, bitorder="little")
    b = np.unpackbits(t, axis=1, bitorder="little")[:, :n]
    assert (a.T[:, :n] == b[: nb * 8]).all()
    # double transpose is identity (on the padded grid)
    tt = transpose_bits(t)
    assert (tt[:n, :nb] == rows).all()


def test_transpose_bits_device_matches_host():
    import jax.numpy as jnp

    rng = np.random.default_rng(1)
    rows = rng.integers(0, 256, (40, 5), dtype=np.uint8)
    host = transpose_bits(rows)
    dev = np.asarray(transpose_bits_device(jnp.asarray(rows)))
    assert (host == dev).all()


# ---------------------------------------------------------------------------
# counting-BF packing (packc.hpp to_n_b / pack_v)
# ---------------------------------------------------------------------------

def test_pack_counting_bf():
    counts = np.array([[0, 1, 2, 3, 4, 7, 8, 255]], dtype=np.uint32)
    w = 2
    rows = pack_counting_bf(counts, w)
    bits = np.unpackbits(rows, axis=1, bitorder="big")[0]
    # value stored = min(ceil(log2(c+1)), 2^w - 1), big-endian in-field
    exp = [0, 1, 2, 2, 3, 3, 3, 3]
    got = [int((bits[2 * i] << 1) | bits[2 * i + 1]) for i in range(8)]
    assert got == exp


def test_pack_counting_bf_reference_golden():
    """Byte-equality against the reference's OWN pack_v, executed: golden
    bytes produced by compiling packc.hpp with the vendored bitpacker

        g++ -std=c++20 -I reference/include
            -I reference/thirdparty/bitpacker/include
            -I reference/thirdparty/span-lite/include

    and packing the counts below at each width (bit 0 = MSB of byte 0,
    values big-endian in-field — bitpacker.hpp:191-229)."""
    counts = np.array([[0, 1, 2, 3, 4, 7, 8, 255, 256, 4294967295, 5, 9]],
                      dtype=np.uint32)
    golden = {
        1: "7f f0",
        2: "1a ff ff",
        3: "05 26 e7 fd c0",
        4: "01 22 33 48 9f 34",
        5: "00 44 21 8c 88 4f c6 40",
        8: "00 01 02 02 03 03 04 08 09 20 03 04",
    }
    for w, hexs in golden.items():
        got = pack_counting_bf(counts, w)[0]
        assert got.tobytes() == bytes.fromhex(hexs.replace(" ", "")), w


# ---------------------------------------------------------------------------
# histograms (histogram.hpp + hist_file.hpp)
# ---------------------------------------------------------------------------

def test_histogram_roundtrip(tmp_path):
    h = KHist(3, 31)
    h.inc_counts(np.array([1, 1, 2, 300, 5, 255]))
    assert h.uniq == 6 and h.total == 564
    assert h.oob_uu == 1 and h.oob_un == 300
    p = str(tmp_path / "x.hist")
    F.write_hist_file(p, h)
    info, hu, hn = F.read_hist_file(p)
    assert info.kmer_size == 31 and info.id == 3
    assert hu[0] == 2 and hu[1] == 1 and hu[4] == 1 and hu[254] == 1
    assert hn[0] == 2 and hn[1] == 2 and hn[254] == 255


def test_compute_merge_thresholds(tmp_path):
    h = KHist(0, 31)
    h.inc_counts(np.repeat(np.arange(1, 11), [100, 50, 20, 10, 5, 3, 2, 2,
                                              2, 6]))
    (thr,) = compute_merge_thresholds([h], 0.9,
                                      str(tmp_path / "amin.txt"))
    assert thr > 0
    assert open(tmp_path / "amin.txt").read() == f"{thr}\n"


# ---------------------------------------------------------------------------
# repartition (repartition.hpp + Repartitor LPT)
# ---------------------------------------------------------------------------

def test_repartition_roundtrip(tmp_path):
    rng = np.random.default_rng(2)
    table = rng.integers(0, 7, 4 ** 5, dtype=np.uint16)
    r = Repartition(table, 7)
    p = str(tmp_path / "repartition.minimRepart")
    r.save(p)
    r2 = Repartition.load(p)
    assert r2.nb_partitions == 7
    assert (r2.table == table).all()
    assert r.compatible_with(r2)


def test_repartition_lpt_balance():
    rng = np.random.default_rng(3)
    sizes = rng.integers(0, 1000, 4 ** 5).astype(np.int64)
    r = Repartition.from_bin_sizes(sizes, 8)
    loads = np.bincount(r.table, weights=sizes, minlength=8)
    assert loads.max() <= loads.min() + sizes.max()   # LPT guarantee


def test_repartition_static_xxh():
    r = Repartition.from_xxh(16, 6)
    assert r.nb_minimizers == 4 ** 6
    assert set(np.unique(r.table)) <= set(range(16))


# ---------------------------------------------------------------------------
# fof grammar (io/fof.hpp)
# ---------------------------------------------------------------------------

def test_fof_grammar(tmp_path):
    p = tmp_path / "x.fof"
    p.write_text("A1 : f1.fa ; f2.fa ! 3\n\nB-2 : f3.fa\n")
    fof = Fof.parse(str(p))
    assert fof.ids() == ["A1", "B-2"]
    assert fof.get_files("A1") == ["f1.fa", "f2.fa"]
    assert fof.entries[0].abundance_min == 3
    assert fof.abundance_mins(2) == [3, 2]
    assert fof.total() == 3

    bad = tmp_path / "bad.fof"
    bad.write_text("A1 : f1.fa\nA1 : f2.fa\n")
    with pytest.raises(IOError):
        Fof.parse(str(bad))
    bad2 = tmp_path / "bad2.fof"
    bad2.write_text("A1 : f1.fa<\n")
    with pytest.raises(IOError):
        Fof.parse(str(bad2))


# ---------------------------------------------------------------------------
# album banks (BankAlbum)
# ---------------------------------------------------------------------------

def test_load_batch_native_and_fallback(tmp_path):
    import gzip

    from kmtricks_tpu.io import sequences as seqio

    fa = tmp_path / "multi.fa"
    fa.write_text(">r1\nACGT\nTTAA\n>r2\nGGGG\n\n>r3\nA\r\nCC\n")
    batch, lengths = seqio.load_batch(str(fa))
    assert list(lengths) == [8, 4, 3]
    assert batch[0, :8].tobytes() == b"ACGTTTAA"
    assert batch[1, :4].tobytes() == b"GGGG"
    assert batch[2, :3].tobytes() == b"ACC"
    assert (batch[1, 4:] == ord("N")).all()

    fq = tmp_path / "a.fq"
    fq.write_text("@r1\nACGTA\n+\nIIIII\n@r2\nTT\n+\nII\n")
    batch, lengths = seqio.load_batch(str(fq))
    assert list(lengths) == [5, 2]
    assert batch[0, :5].tobytes() == b"ACGTA"

    gz = tmp_path / "a.fa.gz"
    with gzip.open(gz, "wt") as f:
        f.write(">x\nACGTACGT\n")
    batch, lengths = seqio.load_batch(str(gz))
    assert batch[0, :8].tobytes() == b"ACGTACGT"

    # composite bank: widths merged, padding preserved
    batch, lengths = seqio.load_batch([str(fa), str(fq)])
    assert len(lengths) == 5 and batch.shape[1] == 8


def test_read_vector_matrix_rows(tmp_path):
    rows = np.arange(80, dtype=np.uint8).reshape(10, 8)
    p = str(tmp_path / "m.cmbf")
    F.write_vector_matrix_file(p, rows, 64, 0, 2, 100, 10)
    info, got = F.read_vector_matrix_rows(p, 3, 4)
    assert info.first == 100 and info.window == 10
    assert (got == rows[3:7]).all()


def test_album_bank(tmp_path):
    from kmtricks_tpu.io import sequences as seqio

    fa1 = tmp_path / "a.fa"
    fa1.write_text(">x\nACGT\n")
    fa2 = tmp_path / "b.fa"
    fa2.write_text(">y\nTTTT\n")
    album = tmp_path / "list.txt"
    album.write_text("a.fa\nb.fa\n")
    assert seqio.sniff_format(str(album)) == "album"
    assert seqio.sniff_format(str(fa1)) == "fasta"
    seqs = [s for _, s in seqio.iter_bank(str(album))]
    assert seqs == [b"ACGT", b"TTTT"]


def test_kasm_matrix_header(tmp_path):
    """kasm-compat count matrix header (matrix_file.hpp:55-74)."""
    import struct

    from kmtricks_tpu import constants as C

    rng = np.random.default_rng(4)
    kmers = rng.integers(0, 2**62, (10, 1), dtype=np.uint64)
    counts = rng.integers(0, 100, (10, 1), dtype=np.uint32)
    rec = np.zeros(10, dtype=np.dtype([("k", "<u8"), ("c", "<u4")]))
    rec["k"], rec["c"] = kmers[:, 0], counts[:, 0]
    p = tmp_path / "kasm.count"
    with open(p, "wb") as f:
        f.write(struct.pack("<QI?", C.MAGIC_BASE, 0, False))
        f.write(struct.pack("<QIIIII", 0xDEAD, 31, 1, 7, 3, 4))
        f.write(rec.tobytes())
    info, kk, cc = F.read_matrix_file(str(p), count_bytes=4, kasm=True)
    assert info.kmer_size == 31 and info.nb_counts == 1
    assert info.id == 7 and info.partition == 3
    assert (kk == kmers).all() and (cc == counts).all()


def test_multihost_glue_single_process():
    from kmtricks_tpu.parallel import multihost as mh

    mh.initialize()                      # no-op single process
    mesh = mh.global_mesh()
    assert mesh.shape["d"] == 8          # the virtual CPU mesh
    lo, hi = mh.host_shard_bounds(100, mesh)
    assert (lo, hi) == (0, 100)          # single process owns all rows
    rows = np.arange(32, dtype=np.int32).reshape(16, 2)
    arr = mh.make_global_batch(rows, mesh)
    assert arr.shape == (16, 2)
    assert (np.asarray(arr) == rows).all()


def test_sdsl_bf_format(tmp_path):
    from kmtricks_tpu.io.howde import bits_to_sdsl_words, write_bf_file

    rng = np.random.default_rng(9)
    bloom = 1024
    bits = rng.integers(0, 256, bloom // 8, dtype=np.uint8)
    p = str(tmp_path / "x.sdsl")
    write_bf_file(p, bits, bloom, 31, fmt="sdsl")
    raw = open(p, "rb").read()
    # sdsl::bit_vector serialization: u64 bit count + LE u64 words
    import struct
    (nbits,) = struct.unpack("<Q", raw[:8])
    assert nbits == bloom
    words = np.frombuffer(raw[8:], dtype=np.uint64)
    assert (words == bits_to_sdsl_words(bits, bloom)).all()
    assert words.view(np.uint8).tobytes() == bits.tobytes()


# ---------------------------------------------------------------------------
# Segment-streamed native batch parsing (io.sequences.iter_batches)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("fmt,gz", [("fasta", False), ("fasta", True),
                                    ("fastq", False), ("fastq", True)])
def test_iter_batches_matches_iter_bank(tmp_path, fmt, gz):
    """Segment-streamed parsing (tiny segments forcing many record-boundary
    cuts) must reconstruct exactly the record iterator's sequences —
    including multi-line FASTA and a missing trailing newline."""
    import gzip as _gzip

    from kmtricks_tpu.io import sequences as seqio

    rng = np.random.default_rng(42 + gz)
    seqs = []
    text = bytearray()
    for i in range(200):
        s = bytes(rng.choice(np.frombuffer(b"ACGTN", np.uint8),
                             int(rng.integers(1, 300))))
        seqs.append(s)
        if fmt == "fasta":
            text += b">r%d desc\n" % i
            # multi-line records with random wrap width
            w = int(rng.integers(10, 120))
            for off in range(0, len(s), w):
                text += s[off:off + w] + b"\n"
        else:
            text += b"@r%d\n" % i + s + b"\n+\n" + b"I" * len(s) + b"\n"
    if fmt == "fasta":
        text = text[:-1]                       # no trailing newline
    path = tmp_path / ("r." + fmt + (".gz" if gz else ""))
    data = bytes(text)
    path.write_bytes(_gzip.compress(data) if gz else data)

    got = []
    for batch, lengths in seqio.iter_batches(str(path), segment_bytes=700):
        for row, n in zip(batch, lengths):
            got.append(row[:n].tobytes())
    assert got == seqs


def test_iter_batches_record_larger_than_segment(tmp_path):
    """A single record spanning many segments (e.g. an assembled
    chromosome) parses correctly and in linear time (the carry is never
    re-scanned)."""
    from kmtricks_tpu.io import sequences as seqio

    rng = np.random.default_rng(7)
    big = bytes(rng.choice(np.frombuffer(b"ACGT", np.uint8), 3_000_000))
    small = b"ACGTACGTAC"
    path = tmp_path / "r.fasta"
    with open(path, "wb") as f:
        f.write(b">big\n")
        for off in range(0, len(big), 80):
            f.write(big[off:off + 80] + b"\n")
        f.write(b">small\n" + small + b"\n")

    got = []
    for batch, lengths in seqio.iter_batches(str(path),
                                             segment_bytes=65536):
        for row, n in zip(batch, lengths):
            got.append(row[:n].tobytes())
    assert got == [big, small]
