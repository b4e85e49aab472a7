"""Per-sample k-mer abundance histograms and soft-min auto-thresholds.

Reference: include/kmtricks/histogram.hpp. ``inc(count)`` is called once per
distinct k-mer BEFORE the hard-min filter; counts outside [lower, upper] go
to out-of-bounds tallies. Vectorized here with bincount.
"""

from __future__ import annotations

import numpy as np


class KHist:
    def __init__(self, idx: int, ksize: int, lower: int = 1, upper: int = 255):
        self.idx = idx
        self.ksize = ksize
        self.lower = lower
        self.upper = upper
        size = upper - lower + 1
        self.hist_u = np.zeros(size, dtype=np.uint64)  # distinct k-mers
        self.hist_n = np.zeros(size, dtype=np.uint64)  # total occurrences
        self.uniq = 0
        self.total = 0
        self.oob_lu = 0  # below lower: distinct
        self.oob_ln = 0  # below lower: total
        self.oob_uu = 0  # above upper: distinct
        self.oob_un = 0  # above upper: total

    def inc_counts(self, counts: np.ndarray) -> None:
        """Tally an array of per-distinct-kmer abundances."""
        c = np.asarray(counts, dtype=np.int64)
        self.uniq += len(c)
        self.total += int(c.sum())
        low = c < self.lower
        high = c > self.upper
        self.oob_lu += int(low.sum())
        self.oob_ln += int(c[low].sum())
        self.oob_uu += int(high.sum())
        self.oob_un += int(c[high].sum())
        inb = c[~low & ~high] - self.lower
        if len(inb):
            bc = np.bincount(inb, minlength=len(self.hist_u))
            self.hist_u += bc.astype(np.uint64)
            self.hist_n += (bc * (np.arange(len(bc)) + self.lower)).astype(np.uint64)

    def merge(self, other: "KHist") -> None:
        self.hist_u += other.hist_u
        self.hist_n += other.hist_n
        self.uniq += other.uniq
        self.total += other.total
        self.oob_lu += other.oob_lu
        self.oob_ln += other.oob_ln
        self.oob_uu += other.oob_uu
        self.oob_un += other.oob_un


def compute_merge_thresholds(hists: list[KHist], p: float,
                             path: str | None = None) -> list[int]:
    """Auto soft-min from histograms (histogram.hpp:218-244): for each
    sample, the smallest abundance index at which the cumulative distinct
    count exceeds ``p * total_distinct``.

    NOTE: the reference implementation resizes its result vector then
    push_backs past the end (histogram.hpp:222-232), so the values it feeds
    back into the merge are zeros — a bug. We implement the documented
    intent (the appended values), not the bug.
    """
    out = []
    for h in hists:
        n = int(h.uniq * p)
        cum = 0
        thr = 0
        for i, v in enumerate(h.hist_u):
            if cum > n:
                thr = i
                break
            cum += int(v)
        out.append(thr)
    if path:
        with open(path, "w") as f:
            for t in out:
                f.write(f"{t}\n")
    return out
