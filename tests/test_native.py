"""Native C++ codec parity vs pure-Python / golden implementations."""

import numpy as np
import pytest
import xxhash

from kmtricks_tpu import native


@pytest.fixture(scope="module")
def L():
    lib = native.lib()
    if lib is None:
        pytest.skip("native build unavailable")
    return lib


def test_xxh(L):
    rng = np.random.default_rng(0)
    for n in (0, 1, 3, 4, 7, 8, 15, 16, 31, 32, 33, 100, 4096):
        data = rng.integers(0, 256, n, dtype=np.uint8).tobytes()
        assert native.xxh64(data) == xxhash.xxh64(data, seed=0).intdigest()
        assert L.km_xxh32(data, n, 0) == xxhash.xxh32(data, seed=0).intdigest()


def test_xxh64_batch_matches_golden(L):
    from kmtricks_tpu.core.hashers import xxh64_words

    rng = np.random.default_rng(1)
    for slots in (1, 2, 4):
        words = rng.integers(0, 2**63, (1000, slots), dtype=np.uint64)
        assert (native.xxh64_batch(words) == xxh64_words(words)).all()


def test_lz4_roundtrip_both_ways(L):
    import importlib

    from kmtricks_tpu.io import lz4 as pylz4

    rng = np.random.default_rng(2)
    payloads = [
        b"",
        b"a" * 100,
        rng.integers(0, 256, 10000, dtype=np.uint8).tobytes(),
        (b"ACGTACGTAA" * 1000),
        rng.integers(0, 4, 50000, dtype=np.uint8).tobytes(),
    ]
    for data in payloads:
        if data:
            nat = native.lz4_compress_block(data)
            # native-compressed decodes with python + native
            assert pylz4.decompress_block(nat) == data
            assert native.lz4_decompress_block(nat, len(data) + 64) == data
        # frame roundtrip with native codecs active
        frame = pylz4.compress(data)
        assert pylz4.decompress(frame) == data


def test_superkmer_pack_parity(L):
    from kmtricks_tpu.runtime import superk as sk

    rng = np.random.default_rng(3)
    for k in (15, 20, 31, 32):
        for nbk in (1, 2, 5, 28):
            codes = rng.integers(0, 4, k + nbk - 1, dtype=np.uint8)
            nat = native.pack_superkmer(codes, k)
            # compare against pure-python (bypass native)
            native._lib_saved = None
            assert nat == _py_pack(codes, k)
            got = native.unpack_superkmer(nat, k, nbk)
            assert (got == codes).all()


def _py_pack(codes, k):
    """Reference python packing (duplicated minimal logic for parity)."""
    n = len(codes)
    out = bytearray()
    i = k - 1
    while i >= 3:
        out.append(int(codes[i]) | int(codes[i - 1]) << 2
                   | int(codes[i - 2]) << 4 | int(codes[i - 3]) << 6)
        i -= 4
    rem = i + 1
    newbyte = 0
    for t in range(rem):
        newbyte |= int(codes[rem - 1 - t]) << (2 * t)
    uid = rem
    for j in range(k, n):
        if uid == 4:
            out.append(newbyte)
            newbyte, uid = 0, 0
        newbyte |= int(codes[j]) << (2 * uid)
        uid += 1
    if uid > 0:
        out.append(newbyte)
    return bytes(out)

def test_bf_fill_matches_numpy_packbits():
    """km_bf_fill (fused presence pack + dense-row scatter) is bit-equal
    to the numpy packbits+scatter path across sample widths that span
    byte boundaries, including counts dtypes u8 and bool."""
    import numpy as np

    from kmtricks_tpu import native

    if native.lib() is None:
        import pytest
        pytest.skip("native library unavailable")
    rng = np.random.default_rng(5)
    for nsamp in (1, 7, 8, 9, 50, 64):
        for dt in (np.uint8, np.bool_):
            window = 4096
            n = 1500
            hashes = np.sort(rng.choice(window, n, replace=False)
                             .astype(np.int64))
            cs = rng.integers(0, 3, (n, nsamp)).astype(dt)
            nb = (nsamp + 7) // 8
            rows = np.zeros((window, nb), np.uint8)
            assert native.bf_fill(cs, hashes, rows, threads=3)
            ref = np.zeros((window, nb), np.uint8)
            ref[hashes] = np.packbits(cs.astype(bool), axis=1,
                                      bitorder="little")
            assert np.array_equal(rows, ref), (nsamp, dt)
