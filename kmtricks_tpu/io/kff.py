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
