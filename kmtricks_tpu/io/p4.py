"""Clean-room TurboPFor-style "p4" integer codec for `.hash.p4` files.

The reference compresses hash-mode count files with TurboPFor
(include/kmtricks/io/hash_file.hpp:100-131): per flushed block of up to
4096 (hash, count) pairs it writes

    [u64 n][u64 hash_bytes][p4nd1enc64(hashes)]
    [u64 count_bytes][p4nzenc{8,16,32}(counts)]

The *container framing* above is reproduced byte-exactly by
``io.formats.write_hash_file``.  The *inner streams* implemented here
follow the public p4 "patched frame-of-reference" scheme:

- the array's first value is stored as an LEB128 varint, then the
  successor deltas are coded in blocks of up to 128 values;
- ``d1`` (strictly-increasing input, hashes): delta = v[i]-v[i-1]-1;
- ``z`` (arbitrary input, counts): zigzag(v[i]-v[i-1]);
- each block: 1 header byte ``b | 0x80*has_exceptions``; if exceptions:
  1 byte ``bx``, an LSB-first presence bitmap of ceil(n/8) bytes, the
  low ``b`` bits of every value (LSB-first bitpacked), then the high
  parts ``v>>b`` of the exception values packed at ``bx`` bits;
  ``b`` is chosen to minimise the encoded block size.

The reference's TurboPFor submodule is not vendored
(thirdparty/TurboPFor-Integer-Compression is empty), so bit-level
identity with the original library cannot be verified in this tree; the
codec is self-consistent (exhaustive roundtrip + property tests in
tests/test_p4.py) and replaces the former NotImplementedError for the
``--cpr`` hash pipeline.
"""

from __future__ import annotations

import numpy as np

BLOCK = 128

_POW2 = np.array([1 << i for i in range(64)], dtype=np.uint64)


def _bitlen(v: np.ndarray) -> np.ndarray:
    """Per-element number of significant bits of a uint64 array."""
    return np.searchsorted(_POW2, v, side="right").astype(np.int64)


def _leb128_put(value: int, out: bytearray) -> None:
    value = int(value)
    while True:
        byte = value & 0x7F
        value >>= 7
        if value:
            out.append(byte | 0x80)
        else:
            out.append(byte)
            return


def _leb128_get(buf: bytes, pos: int) -> tuple[int, int]:
    value = 0
    shift = 0
    while True:
        byte = buf[pos]
        pos += 1
        value |= (byte & 0x7F) << shift
        if not byte & 0x80:
            return value, pos
        shift += 7


def _bitpack(vals: np.ndarray, b: int) -> bytes:
    """LSB-first bitpack of uint64 values at b bits each."""
    if b == 0 or len(vals) == 0:
        return b""
    shifts = np.arange(b, dtype=np.uint64)
    bits = ((vals[:, None] >> shifts) & np.uint64(1)).astype(np.uint8)
    return np.packbits(bits.ravel(), bitorder="little").tobytes()


def _bitunpack(buf: bytes, pos: int, n: int, b: int) -> tuple[np.ndarray, int]:
    if b == 0 or n == 0:
        return np.zeros(n, dtype=np.uint64), pos
    nb = (n * b + 7) // 8
    raw = np.frombuffer(buf, dtype=np.uint8, count=nb, offset=pos)
    bits = np.unpackbits(raw, count=n * b, bitorder="little")
    bits = bits.reshape(n, b).astype(np.uint64)
    vals = (bits << np.arange(b, dtype=np.uint64)).sum(axis=1, dtype=np.uint64)
    return vals, pos + nb


def _best_b(vals: np.ndarray, n: int) -> tuple[int, int, int]:
    """Pick (b, bx, nx) minimising the encoded size of one block."""
    bl = _bitlen(vals)
    maxb = int(bl.max(initial=0))
    hist = np.bincount(bl, minlength=maxb + 1)
    # nx_at[b] = number of values whose bitlen exceeds b
    nx_at = np.concatenate([np.cumsum(hist[::-1])[::-1][1:], [0]])
    best = (maxb, 0, 0)
    best_cost = (n * maxb + 7) // 8
    for b in range(maxb):
        nx = int(nx_at[b])
        bx = maxb - b
        cost = 1 + (n + 7) // 8 + (n * b + 7) // 8 + (nx * bx + 7) // 8
        if nx == 0:
            cost = (n * b + 7) // 8  # no exception section at all
        if cost < best_cost:
            best_cost = cost
            best = (b, bx if nx else 0, nx)
    return best


def _block_enc(vals: np.ndarray, out: bytearray) -> None:
    n = len(vals)
    b, bx, nx = _best_b(vals, n)
    if nx == 0:
        out.append(b)
        out += _bitpack(vals, b)
        return
    out.append(b | 0x80)
    out.append(bx)
    exc = _bitlen(vals) > b
    out += np.packbits(exc, bitorder="little").tobytes()
    mask = np.uint64((1 << b) - 1)
    out += _bitpack(vals & mask, b)
    out += _bitpack(vals[exc] >> np.uint64(b), bx)


def _block_dec(buf: bytes, pos: int, n: int) -> tuple[np.ndarray, int]:
    hdr = buf[pos]
    pos += 1
    b = hdr & 0x7F
    if not hdr & 0x80:
        return _bitunpack(buf, pos, n, b)
    bx = buf[pos]
    pos += 1
    nb = (n + 7) // 8
    bitmap = np.frombuffer(buf, dtype=np.uint8, count=nb, offset=pos)
    pos += nb
    exc = np.unpackbits(bitmap, count=n, bitorder="little").astype(bool)
    low, pos = _bitunpack(buf, pos, n, b)
    high, pos = _bitunpack(buf, pos, int(exc.sum()), bx)
    low[exc] |= high << np.uint64(b)
    return low, pos


def _blocks_enc(deltas: np.ndarray, out: bytearray) -> None:
    for off in range(0, len(deltas), BLOCK):
        _block_enc(deltas[off:off + BLOCK], out)


def _blocks_dec(buf: bytes, pos: int, n: int) -> tuple[np.ndarray, int]:
    parts = []
    remaining = n
    while remaining > 0:
        vals, pos = _block_dec(buf, pos, min(BLOCK, remaining))
        parts.append(vals)
        remaining -= len(vals)
    return (np.concatenate(parts) if parts else np.zeros(0, np.uint64)), pos


# ---------------------------------------------------------------------------
# p4nd1: strictly increasing uint64 (the sorted distinct hashes)
# ---------------------------------------------------------------------------

def p4nd1enc64(vals: np.ndarray) -> bytes:
    vals = np.asarray(vals, dtype=np.uint64).ravel()
    if len(vals) == 0:
        return b""
    out = bytearray()
    _leb128_put(int(vals[0]), out)
    if len(vals) > 1:
        deltas = (vals[1:] - vals[:-1]) - np.uint64(1)
        _blocks_enc(deltas, out)
    return bytes(out)


def p4nd1dec64(buf: bytes, n: int) -> np.ndarray:
    if n == 0:
        return np.zeros(0, dtype=np.uint64)
    first, pos = _leb128_get(buf, 0)
    deltas, pos = _blocks_dec(buf, pos, n - 1)
    vals = np.empty(n, dtype=np.uint64)
    vals[0] = first
    if n > 1:
        np.cumsum(deltas + np.uint64(1), out=vals[1:])
        vals[1:] += np.uint64(first)
    return vals


# ---------------------------------------------------------------------------
# p4nz: zigzag-delta for arbitrary unsigned input (the counts)
# ---------------------------------------------------------------------------

def p4nzenc(vals: np.ndarray, width_bytes: int) -> bytes:
    sdt = {1: np.int8, 2: np.int16, 4: np.int32, 8: np.int64}[width_bytes]
    udt = {1: np.uint8, 2: np.uint16, 4: np.uint32, 8: np.uint64}[width_bytes]
    vals = np.asarray(vals, dtype=udt).ravel()
    if len(vals) == 0:
        return b""
    out = bytearray()
    _leb128_put(int(vals[0]), out)
    if len(vals) > 1:
        d = (vals[1:] - vals[:-1]).astype(sdt)
        zig = ((d.astype(udt) << np.array(1, udt))
               ^ (d >> np.array(width_bytes * 8 - 1, sdt)).astype(udt))
        _blocks_enc(zig.astype(np.uint64), out)
    return bytes(out)


def p4nzdec(buf: bytes, n: int, width_bytes: int) -> np.ndarray:
    udt = {1: np.uint8, 2: np.uint16, 4: np.uint32, 8: np.uint64}[width_bytes]
    if n == 0:
        return np.zeros(0, dtype=udt)
    first, pos = _leb128_get(buf, 0)
    zig, pos = _blocks_dec(buf, pos, n - 1)
    vals = np.empty(n, dtype=udt)
    vals[0] = first
    if n > 1:
        zig = zig.astype(udt)
        sign = np.zeros_like(zig) - (zig & np.array(1, udt))  # 0 or all-ones
        d = (zig >> np.array(1, udt)) ^ sign
        np.cumsum(d, out=vals[1:], dtype=udt)
        vals[1:] += np.array(first, udt)
    return vals
