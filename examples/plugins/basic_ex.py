"""Example merge plugin: discard rows with any abundance below a threshold.

Python equivalent of the reference's plugins/example/basic_ex.cpp — the
plugin verdict REPLACES the recurrence keep-verdict for every merged row
(plugin.hpp:12-30, merge.hpp:252-257). The ``--plugin-config`` string is
the threshold.

Usage:
    kmtricks pipeline ... --plugin examples/plugins/basic_ex.py:BasicEx \
        --plugin-config 2
"""

import numpy as np

from kmtricks_tpu.runtime.plugin import MergePlugin


class BasicEx(MergePlugin):
    def __init__(self):
        self.threshold = 0

    def configure(self, s: str) -> None:
        self.threshold = int(s)

    # Vectorized fast path over the whole merged partition: keep a row
    # only if EVERY sample's count clears the threshold (same semantics
    # as basic_ex.cpp's per-row loop).
    def process_batch(self, keys, counts) -> np.ndarray:
        return (np.asarray(counts) >= self.threshold).all(axis=1)

    # Per-row hooks (used if process_batch were absent) — identical
    # semantics, shown for documentation.
    def process_kmer(self, kmer_data, count_vector) -> bool:
        return bool((count_vector >= self.threshold).all())

    def process_hash(self, h, count_vector) -> bool:
        return bool((count_vector >= self.threshold).all())
