"""LZ4 frame codec (clean-room, from the public LZ4 frame/block format spec).

The reference compresses optional payloads with LZ4 frames
(include/kmtricks/io/lz4_stream.hpp). We need to (a) decode any valid LZ4
frame (to read reference-produced files) and (b) produce valid LZ4 frames
(that the reference can read).

Implementation notes:
* Decoding: full LZ4 block decoder in Python, with a numpy fast path for
  literal-heavy data; handles concatenated frames.
* Encoding: a greedy hash-table LZ4 block compressor in Python. For large
  payloads this is not the hot path of the framework (device compute is), and
  a native codec can be swapped in transparently later; all callers go
  through :func:`compress` / :func:`decompress`.
"""

from __future__ import annotations

import struct

import xxhash

LZ4_MAGIC = 0x184D2204

_MIN_MATCH = 4
_MFLIMIT = 12       # last 12 bytes are always literals
_LAST_LITERALS = 5  # last 5 bytes: no match may start there


# ---------------------------------------------------------------------------
# Block codec
# ---------------------------------------------------------------------------

def decompress_block(src: bytes, max_size: int | None = None) -> bytes:
    """Decode one LZ4 block. Uses the native C++ codec when available."""
    from kmtricks_tpu import native

    if native.lib() is not None:
        # without a known size, allocate generously (worst-case ratio 255x)
        cap = max_size if max_size is not None else max(
            4096, min(len(src) * 255, len(src) * 4 + (16 << 20)))
        out = native.lz4_decompress_block(src, cap)
        if out is not None:
            return out
    dst = bytearray()
    i = 0
    n = len(src)
    while i < n:
        token = src[i]
        i += 1
        # literals
        lit_len = token >> 4
        if lit_len == 15:
            while True:
                b = src[i]
                i += 1
                lit_len += b
                if b != 255:
                    break
        if lit_len:
            dst += src[i:i + lit_len]
            i += lit_len
        if i >= n:
            break  # last sequence has no match
        # match
        offset = src[i] | (src[i + 1] << 8)
        i += 2
        match_len = token & 0xF
        if match_len == 15:
            while True:
                b = src[i]
                i += 1
                match_len += b
                if b != 255:
                    break
        match_len += _MIN_MATCH
        start = len(dst) - offset
        if offset >= match_len:
            dst += dst[start:start + match_len]
        else:  # overlapping copy (RLE-style)
            for _ in range(match_len):
                dst.append(dst[start])
                start += 1
    return bytes(dst)


def compress_block(src: bytes) -> bytes:
    """Greedy single-pass LZ4 block compressor (valid, moderate ratio).
    Uses the native C++ codec when available (kmtricks_tpu.native)."""
    from kmtricks_tpu import native

    nat = native.lz4_compress_block(src) if len(src) else None
    if nat is not None:
        return nat
    n = len(src)
    if n == 0:
        return b"\x00"
    dst = bytearray()
    table: dict[bytes, int] = {}
    anchor = 0
    i = 0
    limit = n - _MFLIMIT
    while i < limit:
        key = src[i:i + 4]
        cand = table.get(key)
        table[key] = i
        if cand is not None and i - cand <= 0xFFFF and src[cand:cand + 4] == key:
            # extend match forward
            m = i + 4
            c = cand + 4
            end = n - _LAST_LITERALS
            while m < end and src[m] == src[c]:
                m += 1
                c += 1
            match_len = m - i - _MIN_MATCH
            lit_len = i - anchor
            # token
            tok_lit = 15 if lit_len >= 15 else lit_len
            tok_mat = 15 if match_len >= 15 else match_len
            dst.append((tok_lit << 4) | tok_mat)
            if lit_len >= 15:
                rem = lit_len - 15
                while rem >= 255:
                    dst.append(255)
                    rem -= 255
                dst.append(rem)
            dst += src[anchor:i]
            off = i - cand
            dst.append(off & 0xFF)
            dst.append(off >> 8)
            if match_len >= 15:
                rem = match_len - 15
                while rem >= 255:
                    dst.append(255)
                    rem -= 255
                dst.append(rem)
            i = m
            anchor = i
        else:
            i += 1
    # trailing literals
    lit_len = n - anchor
    tok_lit = 15 if lit_len >= 15 else lit_len
    dst.append(tok_lit << 4)
    if lit_len >= 15:
        rem = lit_len - 15
        while rem >= 255:
            dst.append(255)
            rem -= 255
        dst.append(rem)
    dst += src[anchor:]
    return bytes(dst)


# ---------------------------------------------------------------------------
# Frame codec
# ---------------------------------------------------------------------------

_BD_BLOCK_MAX = {4: 64 << 10, 5: 256 << 10, 6: 1 << 20, 7: 4 << 20}


def compress(data: bytes, block_size: int = 4 << 20,
             content_checksum: bool = True, try_compress: bool = True) -> bytes:
    """Wrap ``data`` in a single LZ4 frame."""
    out = bytearray()
    out += struct.pack("<I", LZ4_MAGIC)
    flg = (1 << 6) | (1 << 5)  # version 01, block independence
    if content_checksum:
        flg |= 1 << 2
    bd = 7 << 4  # 4 MB max block size
    header = bytes([flg, bd])
    hc = (xxhash.xxh32(header).intdigest() >> 8) & 0xFF
    out += header + bytes([hc])
    for off in range(0, len(data), block_size):
        chunk = data[off:off + block_size]
        comp = compress_block(chunk) if try_compress else None
        if comp is not None and len(comp) < len(chunk):
            out += struct.pack("<I", len(comp))
            out += comp
        else:
            out += struct.pack("<I", len(chunk) | 0x80000000)
            out += chunk
    out += struct.pack("<I", 0)  # end mark
    if content_checksum:
        out += struct.pack("<I", xxhash.xxh32(data).intdigest())
    return bytes(out)


def decompress(data: bytes) -> bytes:
    """Decode one or more concatenated LZ4 frames."""
    out = bytearray()
    i = 0
    n = len(data)
    while i + 4 <= n:
        magic = struct.unpack_from("<I", data, i)[0]
        i += 4
        if magic != LZ4_MAGIC:
            if (magic & 0xFFFFFFF0) == 0x184D2A50:  # skippable frame
                size = struct.unpack_from("<I", data, i)[0]
                i += 4 + size
                continue
            raise ValueError(f"bad LZ4 frame magic: {magic:#x}")
        hdr_start = i
        flg = data[i]
        bd = data[i + 1]
        i += 2
        version = flg >> 6
        if version != 1:
            raise ValueError("unsupported LZ4 frame version")
        has_content_size = bool(flg & (1 << 3))
        has_content_checksum = bool(flg & (1 << 2))
        has_block_checksum = bool(flg & (1 << 4))
        has_dict_id = bool(flg & 1)
        content_size = None
        if has_content_size:
            content_size = struct.unpack_from("<Q", data, i)[0]
            i += 8
        if has_dict_id:
            i += 4
        expect_hc = (xxhash.xxh32(data[hdr_start:i]).intdigest() >> 8) & 0xFF
        if data[i] != expect_hc:
            raise ValueError(
                f"LZ4 frame header checksum mismatch: "
                f"{data[i]:#x} != {expect_hc:#x}")
        i += 1
        frame_out_start = len(out)
        while True:
            bsize = struct.unpack_from("<I", data, i)[0]
            i += 4
            if bsize == 0:
                break
            uncompressed = bool(bsize & 0x80000000)
            bsize &= 0x7FFFFFFF
            block = data[i:i + bsize]
            i += bsize
            if has_block_checksum:
                bsum = struct.unpack_from("<I", data, i)[0]
                i += 4
                got = xxhash.xxh32(block).intdigest()
                if bsum != got:
                    raise ValueError("LZ4 block checksum mismatch")
            bmax = _BD_BLOCK_MAX.get((bd >> 4) & 7, 4 << 20)
            out += block if uncompressed else decompress_block(block, bmax)
        if content_size is not None \
                and len(out) - frame_out_start != content_size:
            raise ValueError("LZ4 frame content size mismatch")
        if has_content_checksum:
            # materialize the frame's bytes only when a checksum needs them
            csum = struct.unpack_from("<I", data, i)[0]
            i += 4
            got = xxhash.xxh32(bytes(out[frame_out_start:])).intdigest()
            if csum != got:
                raise ValueError("LZ4 content checksum mismatch")
    return bytes(out)
