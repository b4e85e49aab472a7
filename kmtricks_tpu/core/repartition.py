"""Minimizer -> partition repartition table.

GATB-compatible binary format (reference include/kmtricks/repartition.hpp:29-144):
u16 nb_partitions, u64 nb_minimizers, u16 nb_pass, u16[nb_minimizers] table,
u8 has_freq, u32 magic 0x12345678. Optional frequency sidecar:
u32[nb_minimizers] freq, u32 magic.

Construction modes:
* :meth:`load` — read a table produced by another run (``--repart-from``),
  or an injected golden table (determinism mode, like the reference tests).
* :meth:`from_xxh` — ``--static-repart``: partition = XXH64(minimizer) % P
  (repartition.hpp:45-56).
* :meth:`from_bin_sizes` — greedy LPT bin packing of sampled k-mer counts
  per minimizer (GATB Repartitor::computeDistrib, PartiInfo.cpp:48-106):
  sort minimizer bins by decreasing count, repeatedly assign the largest
  remaining bin to the partition with the least total.
"""

from __future__ import annotations

import heapq
import struct

import numpy as np

from kmtricks_tpu.constants import MAGIC_GATB_REPART
from kmtricks_tpu.core.hashers import xxh64_u32


import functools


@functools.lru_cache(maxsize=8)
def _xxh_table(nb_partitions: int, minim_size: int) -> np.ndarray:
    """Static-repartition table XXH64(m) % P (repartition.hpp:45-56) —
    cached: 4^m hashes (~1s at m=10) are rebuilt constantly by tests and
    static-repart runs. Callers receive a copy."""
    vals = np.arange(4 ** minim_size, dtype=np.uint32)
    return (xxh64_u32(vals) % np.uint64(nb_partitions)).astype(np.uint16)


class Repartition:
    def __init__(self, table: np.ndarray, nb_partitions: int,
                 nb_pass: int = 1, freq: np.ndarray | None = None):
        self.table = np.asarray(table, dtype=np.uint16)
        self.nb_partitions = int(nb_partitions)
        self.nb_pass = int(nb_pass)
        self.freq = freq

    @property
    def nb_minimizers(self) -> int:
        return len(self.table)

    # -- construction ------------------------------------------------------

    @classmethod
    def load(cls, path: str, freq_path: str | None = None) -> "Repartition":
        with open(path, "rb") as f:
            nb_part, = struct.unpack("<H", f.read(2))
            nb_minims, = struct.unpack("<Q", f.read(8))
            nb_pass, = struct.unpack("<H", f.read(2))
            table = np.frombuffer(f.read(2 * nb_minims), dtype=np.uint16)
            has_freq, = struct.unpack("<?", f.read(1))
            magic, = struct.unpack("<I", f.read(4))
        if magic != MAGIC_GATB_REPART:
            raise IOError("Invalid repartition file format")
        freq = None
        if has_freq and freq_path is None:
            import os
            if os.path.exists(path + ".freq"):
                freq_path = path + ".freq"
        if has_freq and freq_path:
            with open(freq_path, "rb") as f:
                freq = np.frombuffer(f.read(4 * nb_minims), dtype=np.uint32)
                magic, = struct.unpack("<I", f.read(4))
            if magic != MAGIC_GATB_REPART:
                raise IOError("Invalid repartition frequency file format")
        return cls(table.copy(), nb_part, nb_pass, freq)

    def save(self, path: str) -> None:
        with open(path, "wb") as f:
            f.write(struct.pack("<H", self.nb_partitions))
            f.write(struct.pack("<Q", self.nb_minimizers))
            f.write(struct.pack("<H", self.nb_pass))
            f.write(self.table.astype("<u2").tobytes())
            f.write(struct.pack("<?", self.freq is not None))
            f.write(struct.pack("<I", MAGIC_GATB_REPART))
        if self.freq is not None:
            with open(path + ".freq", "wb") as f:
                f.write(self.freq.astype("<u4").tobytes())
                f.write(struct.pack("<I", MAGIC_GATB_REPART))

    @classmethod
    def from_xxh(cls, nb_partitions: int, minim_size: int) -> "Repartition":
        return cls(_xxh_table(nb_partitions, minim_size).copy(),
                   nb_partitions)

    @classmethod
    def from_bin_sizes(cls, bin_sizes: np.ndarray,
                       nb_partitions: int) -> "Repartition":
        """Greedy LPT packing: largest bin to emptiest partition
        (Repartitor::computeDistrib, gatb PartiInfo.cpp:48-106).

        With the native lib, runs the same libstdc++ std::sort +
        std::priority_queue the reference binary runs — tables are
        bit-identical to an executed computeDistrib on the same tallies
        (tests/test_ref_exec_golden.py). The Python fallback applies
        specified tie-breaks instead (equal-sized bins by ascending
        minimizer, equal-loaded partitions by ascending id) — same
        balance quality, different table on ties.
        """
        from kmtricks_tpu import native

        nat = native.lpt_distrib(bin_sizes, nb_partitions)
        if nat is not None:
            return cls(nat, nb_partitions)
        nb_minims = len(bin_sizes)
        order = np.lexsort((np.arange(nb_minims), -bin_sizes.astype(np.int64)))
        table = np.zeros(nb_minims, dtype=np.uint16)
        heap = [(0, p) for p in range(nb_partitions)]
        heapq.heapify(heap)
        sizes = bin_sizes[order]
        for idx in range(nb_minims):
            load, p = heapq.heappop(heap)
            table[order[idx]] = p
            heapq.heappush(heap, (load + int(sizes[idx]), p))
        return cls(table, nb_partitions)

    @classmethod
    def from_bin_sizes_lexi(cls, bin_kmers: np.ndarray,
                            nb_partitions: int) -> "Repartition":
        """--repartition-type 1 (Repartitor::justGroupLexi,
        PartiInfo.cpp:187-217): contiguous lexicographic minimizer ranges
        balanced by sampled k-mer counts; unseen minimizers default to the
        last partition. (The reference lets its range index overrun by one
        at the tail — we clamp to nb_partitions - 1.)"""
        nb_minims = len(bin_kmers)
        table = np.full(nb_minims, nb_partitions - 1, dtype=np.uint16)
        mean = int(bin_kmers.sum()) // nb_partitions
        acc, j = 0, 0
        for i in range(nb_minims):
            table[i] = min(j, nb_partitions - 1)
            acc += int(bin_kmers[i])
            if acc > mean:
                acc = 0
                if j < nb_partitions:
                    j += 1
        return cls(table, nb_partitions)

    @classmethod
    def from_freq_groups(cls, counts: list[tuple[int, int]],
                         bin_kmers: np.ndarray,
                         nb_partitions: int) -> "Repartition":
        """--minimizer-type 1 (Repartitor::justGroup, PartiInfo.cpp:130-185):
        walk minimizers in ascending frequency order, filling partitions up
        to the mean sampled k-mer load; unseen minimizers go to the last
        partition."""
        nb_minims = len(bin_kmers)
        table = np.full(nb_minims, nb_partitions - 1, dtype=np.uint16)
        mean = int(bin_kmers.sum()) // nb_partitions
        acc, j = 0, 0
        for _cnt, mmer in counts:
            table[mmer] = min(j, nb_partitions - 1)
            acc += int(bin_kmers[mmer])
            if acc > mean:
                acc = 0
                if j < nb_partitions:
                    j += 1
        return cls(table, nb_partitions)

    # -- access -------------------------------------------------------------

    def __call__(self, minimizers: np.ndarray) -> np.ndarray:
        return self.table[minimizers]

    def write_minimizers(self, paths: list[str], m: int) -> None:
        """Dump the minimizer set of each partition as text (one per line),
        matching Repartition::write_minimizers (repartition.hpp:120-129).
        Vectorized: decode all 4^m values into one (N, m+1) char matrix,
        then slice rows per partition."""
        from kmtricks_tpu.core.kmer import CODE_TO_BASE
        base = np.frombuffer("".join(CODE_TO_BASE).encode(), dtype=np.uint8)
        vals = np.arange(len(self.table), dtype=np.uint64)
        chars = np.empty((len(vals), m + 1), dtype=np.uint8)
        for j in range(m):
            chars[:, j] = base[
                ((vals >> np.uint64(2 * (m - 1 - j))) & np.uint64(3))
                .astype(np.intp)]
        chars[:, m] = ord("\n")
        for part, path in enumerate(paths):
            with open(path, "wb") as f:
                f.write(chars[self.table == part].tobytes())

    def compatible_with(self, other: "Repartition") -> bool:
        return (self.nb_partitions == other.nb_partitions
                and self.nb_minimizers == other.nb_minimizers
                and (self.table == other.table).all())
