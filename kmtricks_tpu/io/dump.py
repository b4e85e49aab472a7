"""Text dumps of any kmtricks file (reference main_dump, cmd.hpp:274-368).

Formats (per each reader's write_as_text):
  kmer:          "KMER count"
  hash:          "hash count"
  matrix:        "KMER c1 c2 ..."
  matrix_hash:   "hash c1 c2 ..."
  pa_matrix:     "KMER b1 b2 ..." (0/1 per sample)
  pa_matrix_hash:"hash b1 b2 ..."
  hist:          "@LOWER/@UPPER/@OOB_L/@OOB_U" then "abundance count"
"""

from __future__ import annotations

import sys

import numpy as np

from kmtricks_tpu.core.kmer import kmers_to_strings
from kmtricks_tpu.io import formats as F


def dump_text(path: str, out=None, count_bytes: int = 4) -> None:
    out = out or sys.stdout
    t = F.get_km_file_type(path)
    if t == "kmer":
        info, kmers, counts = F.read_kmer_file(path)
        for s, c in zip(kmers_to_strings(kmers, info.kmer_size), counts):
            out.write(f"{s} {int(c)}\n")
    elif t == "hash":
        _, hashes, counts = F.read_hash_file(path)
        for h, c in zip(hashes, counts):
            out.write(f"{int(h)} {int(c)}\n")
    elif t == "matrix":
        info, kmers, counts = F.read_matrix_file(path, count_bytes)
        for s, row in zip(kmers_to_strings(kmers, info.kmer_size), counts):
            out.write(s + " " + " ".join(str(int(c)) for c in row) + "\n")
    elif t == "matrix_hash":
        info, hashes, counts = F.read_matrix_hash_file(path)
        for h, row in zip(hashes, counts):
            out.write(str(int(h)) + " "
                      + " ".join(str(int(c)) for c in row) + "\n")
    elif t == "pa_matrix":
        info, kmers, rows = F.read_pa_matrix_file(path)
        bits = F.unpack_pa_bits(rows, info.bits)
        for s, row in zip(kmers_to_strings(kmers, info.kmer_size), bits):
            out.write(s + " " + " ".join("1" if b else "0" for b in row)
                      + "\n")
    elif t == "pa_matrix_hash":
        info, hashes, rows = F.read_pa_hash_matrix_file(path)
        bits = F.unpack_pa_bits(rows, info.bits)
        for h, row in zip(hashes, bits):
            out.write(str(int(h)) + " "
                      + " ".join("1" if b else "0" for b in row) + "\n")
    elif t == "hist":
        info, hu, hn = F.read_hist_file(path)
        out.write(f"@LOWER={info.lower}\n@UPPER={info.upper}\n")
        out.write(f"@OOB_L={info.oob_lu}\n@OOB_U={info.oob_uu}\n")
        for i, v in enumerate(np.asarray(hu)):
            out.write(f"{info.lower + i} {int(v)}\n")
    else:
        raise IOError(f"KM_FILE::{t} doesn't support text conversion.")
