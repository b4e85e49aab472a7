"""Independent validation of the LZ4 frame codec and xxHash.

Round-1 gap: the LZ4 codec had only self-roundtrip coverage. Here the
decoder is driven with frames hand-assembled from the *public LZ4 frame
and block specifications* (not produced by our compressor), with every
checksum computed by the reference xxhash C library (pip xxhash, 0.8.2)
— so any deviation of our decoder from the spec fails these tests.
Checksum enforcement (header/block/content) is also exercised with
corrupted inputs."""

import struct

import pytest
import xxhash

from kmtricks_tpu.io import lz4


def _frame(blocks: list[bytes | tuple], content: bytes,
           block_checksum: bool = False, content_size: bool = False,
           content_checksum: bool = True) -> bytes:
    """Assemble an LZ4 frame from spec primitives (independent of our
    compressor). blocks: raw bytes (stored uncompressed) or
    ("c", compressed_bytes) for pre-compressed blocks."""
    flg = (1 << 6) | (1 << 5)
    if block_checksum:
        flg |= 1 << 4
    if content_size:
        flg |= 1 << 3
    if content_checksum:
        flg |= 1 << 2
    bd = 4 << 4  # 64 KB max block size
    hdr = bytes([flg, bd])
    if content_size:
        hdr += struct.pack("<Q", len(content))
    out = struct.pack("<I", 0x184D2204) + hdr
    out += bytes([(xxhash.xxh32(hdr).intdigest() >> 8) & 0xFF])
    for b in blocks:
        if isinstance(b, tuple):
            data = b[1]
            out += struct.pack("<I", len(data))
        else:
            data = b
            out += struct.pack("<I", len(data) | 0x80000000)
        out += data
        if block_checksum:
            out += struct.pack("<I", xxhash.xxh32(data).intdigest())
    out += struct.pack("<I", 0)
    if content_checksum:
        out += struct.pack("<I", xxhash.xxh32(content).intdigest())
    return out


# A compressed block hand-derived from the LZ4 block spec:
# content = b"0123456789"*4 + b"ABCDE" (45 bytes)
# seq1: token 0xAF (10 literals, matchlen field 15), literals
#       "0123456789", offset 10 (little-endian), extra matchlen byte 11
#       (match length 15+4+11 = 30 — wait: matchlen = 4 + 15 + 11 = 30)
# seq2: token 0x50 (5 literals, end of block), literals "ABCDE"
HAND_CONTENT = b"0123456789" * 4 + b"ABCDE"
HAND_BLOCK = (b"\xAF" + b"0123456789" + b"\x0A\x00" + b"\x0B"
              + b"\x50" + b"ABCDE")


def test_decode_handmade_uncompressed_frame():
    content = b"Hello LZ4 frame!"
    frame = _frame([content], content)
    assert lz4.decompress(frame) == content


def test_decode_handmade_compressed_frame():
    frame = _frame([("c", HAND_BLOCK)], HAND_CONTENT)
    assert lz4.decompress(frame) == HAND_CONTENT


def test_decode_block_direct():
    assert lz4.decompress_block(HAND_BLOCK) == HAND_CONTENT


def test_decode_multiblock_with_all_options():
    c1, c2 = b"A" * 1000, b"B" * 10
    frame = _frame([c1, c2], c1 + c2, block_checksum=True,
                   content_size=True, content_checksum=True)
    assert lz4.decompress(frame) == c1 + c2


def test_header_checksum_enforced():
    content = b"x" * 32
    frame = bytearray(_frame([content], content))
    frame[6] ^= 0xFF  # corrupt HC byte
    with pytest.raises(ValueError, match="header checksum"):
        lz4.decompress(bytes(frame))


def test_content_checksum_enforced():
    content = b"y" * 32
    frame = bytearray(_frame([content], content))
    frame[-1] ^= 0xFF
    with pytest.raises(ValueError, match="content checksum"):
        lz4.decompress(bytes(frame))


def test_block_checksum_enforced():
    content = b"z" * 32
    frame = bytearray(_frame([content], content, block_checksum=True))
    frame[-9] ^= 0xFF  # block checksum sits before endmark+content sum
    with pytest.raises(ValueError, match="block checksum"):
        lz4.decompress(bytes(frame))


def test_our_frames_verify_under_enforcement():
    import numpy as np
    rng = np.random.default_rng(5)
    for data in (b"", b"a", rng.integers(0, 8, 100_000,
                                         dtype=np.uint8).tobytes()):
        assert lz4.decompress(lz4.compress(data)) == data


def test_native_xxhash_matches_reference_library():
    """Our clean-room native XXH32/64 vs the real xxhash C library."""
    import numpy as np

    from kmtricks_tpu import native
    if native.lib() is None:
        pytest.skip("native library not built")
    rng = np.random.default_rng(9)
    cases = [b"", b"a", b"Nobody inspects the spammish repetition",
             rng.integers(0, 256, 1 << 16, dtype=np.uint8).tobytes()]
    for seed in (0, 1, 0xDEADBEEF):
        for data in cases:
            assert native.xxh64(data, seed) == \
                xxhash.xxh64(data, seed=seed).intdigest()
    # the published vectors, for the record
    assert xxhash.xxh32(b"").intdigest() == 0x02CC5D05
    assert xxhash.xxh64(b"").intdigest() == 0xEF46DB3751D8E999


def test_device_xxh64_matches_reference_library():
    """ops/xxh64 (u32-pair emulation) vs the real library on packed words."""
    import numpy as np

    from kmtricks_tpu.core.hashers import xxh64_words
    rng = np.random.default_rng(11)
    for slots in (1, 2):
        words = rng.integers(0, 2**63, (64, slots), dtype=np.uint64)
        ours = xxh64_words(words)
        for i in range(len(words)):
            exp = xxhash.xxh64(words[i].tobytes()).intdigest()
            assert int(ours[i]) == exp
