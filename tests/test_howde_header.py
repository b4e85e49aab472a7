"""Byte-level golden test for the HowDe-SBT ``.bf`` header layout.

The layout is derived from the reference's writer
(include/kmtricks/howde_utils.hpp:56-122): a 112-byte header
(round_up_16(sizeof(bffileheader) with one bfvectorinfo)) followed by an
SDSL bit_vector (u64 bit count + LE u64 words). The golden hex below was
hand-assembled from that struct layout; any drift in field offsets/sizes
breaks this test. The named constants (magics/version/kind/compressor)
are environment-overridable placeholders — see io/howde.py docstring.
"""

import struct

import numpy as np

from kmtricks_tpu.io import howde


def _expected_header(bloom_size: int, kmer_size: int) -> bytes:
    # bffileheader, little-endian, offsets:
    #  0 magic u64         8 headerSize u32   12 version u32
    # 16 bfKind u32       20 padding1 u32     24 smerSize u32
    # 28 numHashes u32    32 hashSeed1 u64    40 hashSeed2 u64
    # 48 hashModulus u64  56 numBits u64      64 numVectors u32
    # 68 setSizeKnown     72 setSize u64
    # 80 info[0]: compressor u32, name u32, offset u64, numBytes u64,
    #            filterInfo u64  -> 112 total (already 16-aligned)
    h = bytearray(112)
    struct.pack_into("<Q", h, 0, howde.BF_MAGIC)
    struct.pack_into("<I", h, 8, 112)
    struct.pack_into("<I", h, 12, howde.BF_VERSION)
    struct.pack_into("<I", h, 16, howde.BFKIND_SIMPLE)
    struct.pack_into("<I", h, 24, kmer_size)
    struct.pack_into("<I", h, 28, 1)                    # numHashes
    struct.pack_into("<Q", h, 48, bloom_size)           # hashModulus
    struct.pack_into("<Q", h, 56, bloom_size)           # numBits
    struct.pack_into("<I", h, 64, 1)                    # numVectors
    struct.pack_into("<I", h, 80, howde.BVCOMP_UNCOMPRESSED)
    struct.pack_into("<Q", h, 88, 112)                  # info[0].offset
    struct.pack_into("<Q", h, 96, bloom_size // 8 + 8)  # info[0].numBytes
    return bytes(h)


def test_bf_header_golden_bytes(tmp_path):
    bloom, k = 4096, 31
    bits = np.zeros(bloom // 8, dtype=np.uint8)
    bits[0] = 0b101
    path = str(tmp_path / "s.bf")
    howde.write_bf_file(path, bits, bloom, k)
    data = open(path, "rb").read()
    assert data[:112] == _expected_header(bloom, k)
    # payload: sdsl bit_vector = u64 size-in-bits + words
    assert struct.unpack_from("<Q", data, 112)[0] == bloom
    assert len(data) == 112 + 8 + bloom // 8
    assert data[120] == 0b101


def test_bf_header_size_is_112():
    assert howde.header_size(1) == 112


def test_bf_roundtrip_and_sdsl(tmp_path):
    rng = np.random.default_rng(3)
    bloom, k = 8192, 21
    bits = rng.integers(0, 256, bloom // 8, dtype=np.uint8)
    p1 = str(tmp_path / "a.bf")
    howde.write_bf_file(p1, bits, bloom, k)
    meta, back = howde.read_bf_file(p1)
    assert meta["numBits"] == bloom and meta["smerSize"] == k
    np.testing.assert_array_equal(back, bits)
    p2 = str(tmp_path / "a.sdsl")
    howde.write_bf_file(p2, bits, bloom, k, fmt="sdsl")
    raw = open(p2, "rb").read()
    assert struct.unpack_from("<Q", raw, 0)[0] == bloom
    np.testing.assert_array_equal(
        np.frombuffer(raw[8:], dtype=np.uint8), bits)


def test_bf_magic_env_override(tmp_path, monkeypatch):
    import importlib

    monkeypatch.setenv("KMTRICKS_TPU_BF_MAGIC", "0x1122334455667788")
    monkeypatch.setenv("KMTRICKS_TPU_BF_VERSION", "3")
    importlib.reload(howde)
    try:
        bits = np.zeros(64, dtype=np.uint8)
        path = str(tmp_path / "o.bf")
        howde.write_bf_file(path, bits, 512, 31)
        data = open(path, "rb").read()
        assert struct.unpack_from("<Q", data, 0)[0] == 0x1122334455667788
        assert struct.unpack_from("<I", data, 12)[0] == 3
    finally:
        monkeypatch.delenv("KMTRICKS_TPU_BF_MAGIC")
        monkeypatch.delenv("KMTRICKS_TPU_BF_VERSION")
        importlib.reload(howde)
