"""Example merge plugin using the k-mer value: threshold-filter only rows
whose k-mer starts with 'A'.

Python equivalent of the reference's plugins/example/template_ex.cpp
(which decodes the packed k-mer through km::Kmer<MAX_K> and checks
``at(0) == 'A'``). Here the packed little-endian u64 words are decoded
with :func:`kmtricks_tpu.core.kmer.kmers_to_strings`.

Usage:
    kmtricks pipeline ... --plugin examples/plugins/template_ex.py \
        --plugin-config 2
"""

import numpy as np

from kmtricks_tpu.core.kmer import kmers_to_strings
from kmtricks_tpu.runtime.plugin import MergePlugin


class TemplateEx(MergePlugin):
    def __init__(self):
        self.threshold = 0

    def configure(self, s: str) -> None:
        self.threshold = int(s)

    def process_batch(self, keys, counts) -> np.ndarray:
        rows = np.atleast_2d(np.asarray(keys))
        starts_a = np.array(
            [s[0] == "A" for s in kmers_to_strings(rows, self.kmer_size)],
            dtype=bool)          # dtype matters for the empty partition
        clears = (np.asarray(counts) >= self.threshold).all(axis=1)
        # rows not starting with 'A' are kept unconditionally
        return ~starts_a | clears
