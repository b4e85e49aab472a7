"""KFF (Kmer File Format) v1 writer/reader.

Matches the reference's KFF output (include/kmtricks/io/kff_file.hpp:38-131):
encoding A=0,C=1,G=3,T=2; a global-variable section with k / max=1 /
data_size; one raw section holding every counted k-mer with its count as
big-endian payload bytes.

Layout implemented per the public KFF v1 specification (Dufresne et al.,
Bioinformatics 2022; github.com/Kmer-File-Format) — the reference's vendored
kff-cpp-api submodule is not checked out in this tree, so the layout follows
the published spec: magic "KFF", u8 version major/minor, u8 encoding (the
four 2-bit codes packed a<<6|c<<4|g<<2|t), u8 uniqueness, u8 canonicity,
u32(be) free_size + free block, then sections ('v': u64(be) nb_vars then
(name\\0, u64(be) value)*; 'r': u64(be) nb_blocks then blocks), closing
magic "KFF". In a raw block the k-mer count per block prefix is
ceil(log2(max+1)/8) bytes and is omitted when max == 1; nucleotides are
packed 2 bits each, 4 per byte, with the leftmost k-mer base in the high
bits and any partial group in the FIRST byte (kff_file.hpp:91-105).
"""

from __future__ import annotations

import struct

import numpy as np

MAGIC = b"KFF"
VERSION = (1, 0)
# kmtricks encoding: A=0, C=1, G=3, T=2 (kff_file.hpp:44-45)
ENCODING = (0, 1, 3, 2)


def _encoding_byte(enc=ENCODING) -> int:
    a, c, g, t = enc
    return (a << 6) | (c << 4) | (g << 2) | t


def _pack_seq(seq_codes: np.ndarray) -> bytes:
    """Pack 2-bit codes, 4 per byte, leftmost base in high bits, partial
    group in the first byte (KffWriter::encode_sequence)."""
    n = len(seq_codes)
    rem = n % 4
    out = bytearray()
    i = 0
    if rem:
        val = 0
        for j in range(rem):
            val = (val << 2) | int(seq_codes[j])
        out.append(val)
        i = rem
    while i < n:
        out.append((int(seq_codes[i]) << 6) | (int(seq_codes[i + 1]) << 4)
                   | (int(seq_codes[i + 2]) << 2) | int(seq_codes[i + 3]))
        i += 4
    return bytes(out)


def _codes_kff_from_km(km_codes: np.ndarray) -> np.ndarray:
    """kmtricks 2-bit codes (A0 C1 T2 G3) -> KFF encoding codes (A0 C1 G3
    T2): both use (ascii>>1)&3, so they are identical."""
    return km_codes


def write_kff_file(path: str, kmers: np.ndarray, counts: np.ndarray,
                   kmer_size: int, count_bytes: int = 4) -> None:
    """Write counted k-mers ((N, slots) packed u64 rows + counts) as KFF."""
    from kmtricks_tpu.core.kmer import kmers_to_strings
    from kmtricks_tpu.constants import NT_TO_CODE_TABLE

    with open(path, "wb") as f:
        f.write(MAGIC)
        f.write(bytes([VERSION[0], VERSION[1], _encoding_byte(), 0, 0]))
        f.write(struct.pack(">I", 0))                    # free_size
        # global variables section
        f.write(b"v")
        f.write(struct.pack(">Q", 3))
        for name, value in (("k", kmer_size), ("max", 1),
                            ("data_size", count_bytes)):
            f.write(name.encode() + b"\x00" + struct.pack(">Q", value))
        # raw section
        f.write(b"r")
        f.write(struct.pack(">Q", len(counts)))
        cfmt = {1: ">B", 2: ">H", 4: ">I", 8: ">Q"}[count_bytes]
        for s, c in zip(kmers_to_strings(np.atleast_2d(kmers), kmer_size),
                        counts):
            codes = NT_TO_CODE_TABLE[np.frombuffer(s.encode(), np.uint8)]
            f.write(_pack_seq(codes))
            f.write(struct.pack(cfmt, int(c)))
        f.write(MAGIC)


# ---------------------------------------------------------------------------
# Minimizer ('m') sections — KffSkWriter parity (kff_file.hpp:136-206).
# In the reference KffSkWriter is declared but never instantiated (no
# --kff-sk-output flag is defined and no task constructs it); here the
# equivalent is a working library + `count --mode kff-sk` path.
# ---------------------------------------------------------------------------

def _nb_kmers_bytes(max_kmers: int) -> int:
    return max(1, (int(max_kmers).bit_length() + 7) // 8)


def _mini_pos_bytes(k: int, m: int, max_kmers: int) -> int:
    """Bytes to store a minimizer position: positions run to
    (k + max - 1) - m, the longest superkmer minus the minimizer."""
    return max(1, (int(k + max_kmers - 1 - m).bit_length() + 7) // 8)


def write_kff_sk_file(path: str, blocks, kmer_size: int, minim_size: int,
                      max_kmers: int = 255, data_size: int = 1) -> None:
    """Write superkmer blocks as KFF minimizer sections.

    ``blocks``: iterable of (codes, minim_pos, counts) where ``codes`` is the
    superkmer's 2-bit code array (kmtricks A0 C1 T2 G3 == KFF codes),
    ``minim_pos`` the forward position of the minimizer inside it, and
    ``counts`` one count per k-mer (uint, saturated to data_size bytes).
    Globals follow KffSkWriter's ctor: k, m, max=255, data_size=1
    (kff_file.hpp:146-151). Blocks sharing the same literal minimizer
    substring are grouped into one 'm' section; the stored sequence has the
    minimizer removed (reinserted at read time), per the KFF v1 spec.
    """
    m = minim_size
    npos = _mini_pos_bytes(kmer_size, m, max_kmers)
    nnb = _nb_kmers_bytes(max_kmers)
    cmax = (1 << (8 * data_size)) - 1
    sections: dict[bytes, list[bytes]] = {}
    order: list[bytes] = []
    for codes, pos, counts in blocks:
        codes = np.asarray(codes, dtype=np.uint8)
        key = codes[pos:pos + m].tobytes()
        nk = len(codes) - kmer_size + 1
        assert len(counts) == nk and nk <= max_kmers
        body = bytearray()
        body += int(nk).to_bytes(nnb, "big")
        body += int(pos).to_bytes(npos, "big")
        body += _pack_seq(np.concatenate([codes[:pos], codes[pos + m:]]))
        for c in counts:
            body += int(min(int(c), cmax)).to_bytes(data_size, "big")
        if key not in sections:
            sections[key] = []
            order.append(key)
        sections[key].append(bytes(body))
    with open(path, "wb") as f:
        f.write(MAGIC)
        f.write(bytes([VERSION[0], VERSION[1], _encoding_byte(), 0, 0]))
        f.write(struct.pack(">I", 0))
        f.write(b"v")
        f.write(struct.pack(">Q", 4))
        for name, value in (("k", kmer_size), ("m", m),
                            ("max", max_kmers), ("data_size", data_size)):
            f.write(name.encode() + b"\x00" + struct.pack(">Q", value))
        for key in order:
            f.write(b"m")
            f.write(_pack_seq(np.frombuffer(key, dtype=np.uint8)))
            f.write(struct.pack(">Q", len(sections[key])))
            for body in sections[key]:
                f.write(body)
        f.write(MAGIC)


def _unpack_seq(buf: bytes, n: int) -> np.ndarray:
    """Inverse of _pack_seq: n 2-bit codes from ceil(n/4) bytes."""
    out = np.empty(n, dtype=np.uint8)
    rem = n % 4
    i = j = 0
    if rem:
        b = buf[0]
        for t in range(rem):
            out[t] = (b >> (2 * (rem - 1 - t))) & 3
        i, j = 1, rem
    for b in buf[i:]:
        for sh in (6, 4, 2, 0):
            if j < n:
                out[j] = (b >> sh) & 3
                j += 1
    return out


def read_kff_sk_file(path: str):
    """Read a minimizer-section KFF file back to
    (gvars, [(codes, minim_pos, counts)]) with minimizers reinserted."""
    data = open(path, "rb").read()
    if data[:3] != MAGIC or data[-3:] != MAGIC:
        raise IOError("not a KFF file")
    (free_size,) = struct.unpack_from(">I", data, 8)
    i = 12 + free_size
    gvars: dict[str, int] = {}
    out = []
    while i < len(data) - 3:
        sec = data[i:i + 1]
        i += 1
        if sec == b"v":
            (nv,) = struct.unpack_from(">Q", data, i)
            i += 8
            for _ in range(nv):
                end = data.index(b"\x00", i)
                gvars[data[i:end].decode()] = \
                    struct.unpack_from(">Q", data, end + 1)[0]
                i = end + 9
        elif sec == b"m":
            k, m = gvars["k"], gvars["m"]
            mx, ds = gvars["max"], gvars["data_size"]
            npos = _mini_pos_bytes(k, m, mx)
            nnb = _nb_kmers_bytes(mx)
            mini = _unpack_seq(data[i:i + (m + 3) // 4], m)
            i += (m + 3) // 4
            (nb,) = struct.unpack_from(">Q", data, i)
            i += 8
            for _ in range(nb):
                nk = int.from_bytes(data[i:i + nnb], "big")
                i += nnb
                pos = int.from_bytes(data[i:i + npos], "big")
                i += npos
                slen = nk + k - 1 - m
                sbytes = (slen + 3) // 4
                rest = _unpack_seq(data[i:i + sbytes], slen)
                i += sbytes
                counts = np.array(
                    [int.from_bytes(data[i + t * ds:i + (t + 1) * ds], "big")
                     for t in range(nk)], dtype=np.uint32)
                i += nk * ds
                codes = np.concatenate([rest[:pos], mini, rest[pos:]])
                out.append((codes, pos, counts))
        else:
            raise IOError(f"unsupported KFF section {sec!r}")
    return gvars, out


def read_kff_file(path: str) -> tuple[dict, list[tuple[str, int]]]:
    """Read back a KFF file written by :func:`write_kff_file` (raw sections,
    max=1). Returns ({vars}, [(kmer string, count)])."""
    data = open(path, "rb").read()
    if data[:3] != MAGIC or data[-3:] != MAGIC:
        raise IOError("not a KFF file")
    enc = data[5]
    codes = {(enc >> 6) & 3: "A", (enc >> 4) & 3: "C",
             (enc >> 2) & 3: "G", enc & 3: "T"}
    (free_size,) = struct.unpack_from(">I", data, 8)
    i = 12 + free_size
    gvars: dict[str, int] = {}
    out: list[tuple[str, int]] = []
    while i < len(data) - 3:
        sec = data[i:i + 1]
        i += 1
        if sec == b"v":
            (nv,) = struct.unpack_from(">Q", data, i)
            i += 8
            for _ in range(nv):
                end = data.index(b"\x00", i)
                name = data[i:end].decode()
                (val,) = struct.unpack_from(">Q", data, end + 1)
                gvars[name] = val
                i = end + 9
        elif sec == b"r":
            k = gvars["k"]
            ds = gvars["data_size"]
            mx = gvars.get("max", 1)
            assert mx == 1, "only max=1 raw sections supported"
            (nb,) = struct.unpack_from(">Q", data, i)
            i += 8
            nbytes = (k + 3) // 4
            cfmt = {1: ">B", 2: ">H", 4: ">I", 8: ">Q"}[ds]
            for _ in range(nb):
                seq = data[i:i + nbytes]
                i += nbytes
                (cnt,) = struct.unpack_from(cfmt, data, i)
                i += ds
                rem = k % 4
                chars = []
                bi = 0
                if rem:
                    b = seq[0]
                    for j in range(rem):
                        chars.append(codes[(b >> (2 * (rem - 1 - j))) & 3])
                    bi = 1
                for b in seq[bi:]:
                    for sh in (6, 4, 2, 0):
                        chars.append(codes[(b >> sh) & 3])
                out.append(("".join(chars[:k]), cnt))
        else:
            raise IOError(f"unsupported KFF section {sec!r}")
    return gvars, out
