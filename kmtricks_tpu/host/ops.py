"""Host (numpy) golden implementations of the framework's compute ops.

These are the exact, vectorized reference semantics — the device (JAX)
pipeline in :mod:`kmtricks_tpu.ops` is tested for parity against them, and
small workloads can run through them directly.

Ops:
* :func:`count_sequences` — reads -> per-partition canonical k-mer (or hash)
  counts for one sample (reference KmFillPartitions + *PartCounter +
  *CountProcessor semantics).
* :func:`merge_partition` — cross-sample k-way merge with kmtricks'
  low-abundance rescue (reference merge.hpp:183-260 / 441-517).
* :func:`bf_rows_from_merge` — dense vertical Bloom-filter window rows
  (reference HashMerger::write_as_bf, merge.hpp:575-600).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from kmtricks_tpu.core import kmer as kops
from kmtricks_tpu.core.hashers import xxh64_words


# ---------------------------------------------------------------------------
# Counting
# ---------------------------------------------------------------------------

def sort_rows(words: np.ndarray) -> np.ndarray:
    """Sort (N, S) little-endian multi-word values lexicographically."""
    if words.shape[1] == 1:
        order = np.argsort(words[:, 0], kind="stable")
    else:
        order = np.lexsort(tuple(words[:, i] for i in range(words.shape[1])))
    return order


def run_length_count(words: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """RLE over sorted rows -> (unique rows, counts)."""
    n = len(words)
    if n == 0:
        return words, np.zeros(0, dtype=np.uint64)
    head = np.ones(n, dtype=bool)
    head[1:] = (words[1:] != words[:-1]).any(axis=1)
    starts = np.flatnonzero(head)
    counts = np.diff(np.append(starts, n)).astype(np.uint64)
    return words[starts], counts


@dataclass
class SampleCounts:
    """Per-partition sorted count tables for one sample."""
    kmer_size: int
    nb_partitions: int
    # partition -> (keys, counts); keys (N,S) u64 for kmer mode, (N,) for hash
    partitions: dict = field(default_factory=dict)
    n_kmers_total: int = 0  # distinct k-mers before hard-min (for histograms)


def count_sequences(
    sequences: list[bytes],
    k: int,
    m: int,
    repart_table: np.ndarray,
    hard_min: int = 1,
    mode: str = "kmer",          # "kmer" | "hash"
    window_bits: int | None = None,
    count_max: int = 0xFFFFFFFF,
    hist=None,
    partition_filter=None,
    freq_order=None,
    mmer_canonical: bool = True,
) -> SampleCounts:
    """Count one sample's reads into per-partition sorted tables.

    Routing: each valid k-mer window is routed by its masked-m-mer
    minimizer through the repartition table; the counted key is the
    canonical k-mer (kmer mode) or its window hash (hash mode:
    XXH64 % window + window * partition). ``mmer_canonical`` picks the
    minimizer scheme: True (default) = canonical m-mers — the reference
    binary's actual routing (its NONCANONICAL define is dead by include
    order) and its committed fixtures; False = forward m-mers (the dead
    define's intent) — both GATB-executed-golden-tested
    (tests/test_ref_exec_golden.py).
    """
    nb_parts = int(repart_table.max()) + 1 if len(repart_table) else 1
    slots = kops.slots_for_k(k)

    all_keys = []   # per-chunk packed canonical kmers
    all_parts = []
    # Reads are concatenated with k-1 'N' separators and processed in
    # ~2M-base chunks: every window spanning a separator (or read
    # boundary) is invalid by construction, so the batch is semantically
    # identical to per-read processing while amortizing the numpy call
    # overhead (~20x on short-read collections).
    sep = b"N" * (k - 1)
    CHUNK_BASES = 1 << 21
    i, nseq = 0, len(sequences)
    while i < nseq:
        j, total = i, 0
        while j < nseq and total < CHUNK_BASES:
            total += len(sequences[j]) + k - 1
            j += 1
        blob = sep.join(bytes(s) for s in sequences[i:j])
        i = j
        codes, valid = kops.encode_ascii(blob)
        if len(codes) < k:
            continue
        wvalid = kops.window_validity(valid, k)
        if not wvalid.any():
            continue
        minim = kops.window_minimizers(codes, k, m, freq_order=freq_order,
                                       canonical_mmers=mmer_canonical)
        parts = repart_table[minim[wvalid]]
        fwd = kops.kmers_from_codes(codes, k)[wvalid]
        cano = kops.canonical(fwd, k)
        all_keys.append(cano)
        all_parts.append(parts.astype(np.uint32))

    out = SampleCounts(kmer_size=k, nb_partitions=nb_parts)
    if not all_keys:
        return out

    keys = np.concatenate(all_keys)          # (N, slots)
    parts = np.concatenate(all_parts)        # (N,)

    if mode == "hash":
        assert window_bits is not None
        h = xxh64_words(keys)
        keys = (h % np.uint64(window_bits)
                + np.uint64(window_bits) * parts.astype(np.uint64))
        keys = keys.reshape(-1, 1)

    for p in range(nb_parts):
        if partition_filter is not None and p not in partition_filter:
            continue
        sel = parts == p
        if not sel.any():
            pk = keys[sel]
            out.partitions[p] = (pk if mode == "kmer" else pk.ravel(),
                                 np.zeros(0, dtype=np.uint32))
            continue
        pk = keys[sel]
        order = sort_rows(pk)
        uniq, cnt = run_length_count(pk[order])
        out.n_kmers_total += len(uniq)
        if hist is not None:
            hist.inc_counts(cnt)
        solid = cnt >= hard_min
        cnt = np.minimum(cnt[solid], count_max).astype(np.uint32)
        uniq = uniq[solid]
        out.partitions[p] = (uniq if mode == "kmer" else uniq.ravel(), cnt)
    return out


class StreamCounter:
    """Bounded-memory streaming counter for one sample.

    Feed read batches with :meth:`add_batch`; each block reduces
    immediately to per-partition sorted (key, count) partial tables
    (occurrence arrays never outlive a block), and partials collapse
    into one table per partition whenever their total size crosses
    ``budget_entries`` — host RSS stays O(budget + block), regardless of
    sample size (the reference streams banks through fixed radix buffers
    the same way, BankFasta.cpp + PartiInfo pre-sizing). finish() returns
    exactly count_sequences' output (counts sum associatively; hard-min,
    saturation and histogram all apply after full aggregation).
    """

    def __init__(self, k: int, m: int, repart_table: np.ndarray, *,
                 mode: str = "kmer", window_bits: int | None = None,
                 freq_order=None, mmer_canonical: bool = True,
                 budget_entries: int = 16_000_000):
        self.k, self.m = k, m
        self.table = repart_table
        self.mode = mode
        self.window_bits = window_bits
        self.freq_order = freq_order
        self.mmer_canonical = mmer_canonical
        self.budget = budget_entries
        self.nb_parts = int(repart_table.max()) + 1 if len(repart_table) \
            else 1
        self.slots = kops.slots_for_k(k)
        self.partials: list[list] = [[] for _ in range(self.nb_parts)]
        self.entries = 0

    def add_batch(self, batch: np.ndarray, lengths: np.ndarray) -> None:
        """(B, L) padded read rows -> per-partition partial tables."""
        k = self.k
        # one invalid separator column; padding is already invalid
        flat = np.hstack([batch, np.full((batch.shape[0], 1), ord("N"),
                                         np.uint8)]).ravel()
        codes, valid = kops.encode_ascii(flat)
        if len(codes) < k:
            return
        wvalid = kops.window_validity(valid, k)
        if not wvalid.any():
            return
        minim = kops.window_minimizers(
            codes, k, self.m, freq_order=self.freq_order,
            canonical_mmers=self.mmer_canonical)
        parts = self.table[minim[wvalid]].astype(np.uint32)
        keys = kops.canonical(kops.kmers_from_codes(codes, k)[wvalid], k)
        if self.mode == "hash":
            h = xxh64_words(keys)
            keys = (h % np.uint64(self.window_bits)
                    + np.uint64(self.window_bits)
                    * parts.astype(np.uint64)).reshape(-1, 1)
        for p in np.unique(parts):
            pk = keys[parts == p]
            order = sort_rows(pk)
            uniq, cnt = run_length_count(pk[order])
            self.partials[int(p)].append((uniq, cnt.astype(np.uint64)))
            self.entries += len(uniq)
        if self.entries > self.budget:
            self._collapse()

    def _collapse(self) -> None:
        self.entries = 0
        for p in range(self.nb_parts):
            if len(self.partials[p]) > 1:
                self.partials[p] = [_sum_sorted_tables(self.partials[p])]
            if self.partials[p]:
                self.entries += len(self.partials[p][0][0])

    def finish(self, hard_min: int, count_max: int,
               hist=None) -> SampleCounts:
        self._collapse()
        out = SampleCounts(kmer_size=self.k, nb_partitions=self.nb_parts)
        for p in range(self.nb_parts):
            if not self.partials[p]:
                z = np.zeros((0, self.slots), dtype=np.uint64)
                out.partitions[p] = (z if self.mode == "kmer"
                                     else z.ravel(),
                                     np.zeros(0, dtype=np.uint32))
                continue
            uniq, cnt = self.partials[p][0]
            out.n_kmers_total += len(uniq)
            if hist is not None:
                hist.inc_counts(cnt)
            solid = cnt >= hard_min
            ccnt = np.minimum(cnt[solid], count_max).astype(np.uint32)
            uniq = uniq[solid]
            out.partitions[p] = (uniq if self.mode == "kmer"
                                 else uniq.ravel(), ccnt)
        return out


def _sum_sorted_tables(tables: list) -> tuple:
    """Merge sorted (keys, counts) tables, summing duplicate keys."""
    keys = np.concatenate([t[0] for t in tables])
    cnts = np.concatenate([t[1] for t in tables])
    k2 = keys.reshape(len(keys), -1)
    order = sort_rows(k2)
    k2, cnts = k2[order], cnts[order]
    head = np.ones(len(k2), dtype=bool)
    head[1:] = (k2[1:] != k2[:-1]).any(axis=1)
    idx = np.cumsum(head) - 1
    summed = np.zeros(int(idx[-1]) + 1, dtype=np.uint64)
    np.add.at(summed, idx, cnts)
    uniq = k2[head]
    return (uniq.reshape((-1,) + tables[0][0].shape[1:]), summed)


# ---------------------------------------------------------------------------
# Cross-sample merge with rescue
# ---------------------------------------------------------------------------

@dataclass
class MergeStats:
    """Per-sample merge statistics (reference MergeStatistics, merge.hpp:49-100)."""
    non_solid: np.ndarray
    rescued: np.ndarray
    uniq_wo_rescue: np.ndarray
    uniq_w_rescue: np.ndarray
    total_wo_rescue: np.ndarray
    total_w_rescue: np.ndarray

    def serialize(self, path: str) -> None:
        # trailing tab after every value (write_vector, utils.hpp:190-195)
        def line(name, vec):
            return (name + "\t"
                    + "".join(f"{int(v)}\t" for v in vec) + "\n")
        with open(path, "w") as f:
            f.write(line("NON_SOLID", self.non_solid))
            f.write(line("RESCUED", self.rescued))
            f.write(line("UNIQUE_WO_RESCUE", self.uniq_wo_rescue))
            f.write(line("UNIQUE_W_RESCUE", self.uniq_w_rescue))
            f.write(line("TOTAL_WO_RESCUE", self.total_wo_rescue))
            f.write(line("TOTAL_W_RESCUE", self.total_w_rescue))


@dataclass
class MergeResult:
    keys: np.ndarray      # (M, S) u64 (kmer mode) or (M,) u64 (hash mode)
    counts: np.ndarray    # (M, nb_samples) uint — post-rescue-zeroing
    keep: np.ndarray      # (M,) bool — recurrence filter verdict
    stats: MergeStats


def merge_partition(
    keys_list: list[np.ndarray],
    counts_list: list[np.ndarray],
    amin_vec: np.ndarray,
    rmin: int,
    save_if: int,
) -> MergeResult:
    """N-way merge of per-sample sorted count tables with rescue.

    Exact vectorized reformulation of the reference streaming merge
    (merge.hpp next(), lines 183-260): for each distinct key, a present
    sample is *solid* iff count >= its abundance-min; non-solid counts are
    zeroed unless the key is solid in >= ``save_if`` samples (and
    ``save_if > 0``); a row is kept iff #solid >= ``rmin``.
    """
    nsamp = len(keys_list)
    multiword = keys_list[0].ndim == 2
    slots = keys_list[0].shape[1] if multiword else 1

    keys = np.concatenate([kk.reshape(len(kk), slots) for kk in keys_list])
    cnts = np.concatenate([np.asarray(c, dtype=np.uint64) for c in counts_list])
    samp = np.concatenate([np.full(len(keys_list[i]), i, dtype=np.int32)
                           for i in range(nsamp)])

    if len(keys) == 0:
        z = np.zeros(nsamp, dtype=np.uint64)
        return MergeResult(
            keys=np.zeros((0, slots) if multiword else (0,), dtype=np.uint64),
            counts=np.zeros((0, nsamp), dtype=np.uint32),
            keep=np.zeros(0, dtype=bool),
            stats=MergeStats(z.copy(), z.copy(), z.copy(), z.copy(), z.copy(),
                             z.copy()))

    order = sort_rows(keys)
    keys, cnts, samp = keys[order], cnts[order], samp[order]

    head = np.ones(len(keys), dtype=bool)
    head[1:] = (keys[1:] != keys[:-1]).any(axis=1)
    row_id = np.cumsum(head) - 1
    nrows = int(row_id[-1]) + 1

    mat = np.zeros((nrows, nsamp), dtype=np.uint64)
    present = np.zeros((nrows, nsamp), dtype=bool)
    mat[row_id, samp] = cnts
    present[row_id, samp] = True
    ukeys = keys[head]
    return merge_dense(ukeys if multiword else ukeys.ravel(), mat,
                       amin_vec, rmin, save_if, present=present)


def merge_dense(ukeys: np.ndarray, pre: np.ndarray, amin_vec: np.ndarray,
                rmin: int, save_if: int,
                present: np.ndarray | None = None) -> MergeResult:
    """Merge semantics over a DENSE pre-merge count matrix (rows x samples
    of saturated post-hard-min counts, 0 = absent) — the exact
    merge.hpp:183-260 logic. This is what the device compaction path
    (ops/compact.py) fetches: zero cells are unambiguous because a present
    (key, sample) pair always counted >= 1 at the count stage."""
    if present is None:
        present = pre > 0
    pre = np.asarray(pre)
    # dtype-aware: the device path fetches narrowed (u8/u16) matrices;
    # widening a many-sample dense matrix costs seconds and 4x RSS.
    # Promote only when a threshold exceeds the count dtype's range.
    amax = int(np.asarray(amin_vec).max()) if len(amin_vec) else 0
    if pre.dtype == np.uint64 or amax > np.iinfo(pre.dtype).max:
        pre = pre.astype(np.uint64)
    amin = np.minimum(np.asarray(amin_vec, dtype=np.uint64),
                      np.iinfo(pre.dtype).max if amax <= np.iinfo(
                          pre.dtype).max else amax).astype(pre.dtype)[None, :]
    solid = present & (pre >= amin)
    solid_in = solid.sum(axis=1)
    keep = solid_in >= rmin
    if save_if > 0:
        rescued = present & ~solid & (solid_in >= save_if)[:, None]
    else:
        rescued = np.zeros_like(solid)
    final = np.where(solid | rescued, pre, pre.dtype.type(0))

    stats = MergeStats(
        non_solid=(present & ~solid).sum(axis=0, dtype=np.uint64),
        rescued=rescued.sum(axis=0, dtype=np.uint64),
        uniq_wo_rescue=solid.sum(axis=0, dtype=np.uint64),
        uniq_w_rescue=(solid | rescued).sum(axis=0, dtype=np.uint64),
        total_wo_rescue=np.where(solid, pre, pre.dtype.type(0)).sum(
            axis=0, dtype=np.uint64),
        total_w_rescue=final.sum(axis=0, dtype=np.uint64),
    )
    return MergeResult(keys=ukeys, counts=final, keep=keep, stats=stats)


def saturate_counts(counts: np.ndarray, count_bytes: int) -> np.ndarray:
    maxv = (1 << (8 * count_bytes)) - 1
    return np.minimum(counts, maxv)


# ---------------------------------------------------------------------------
# Bloom filter window rows
# ---------------------------------------------------------------------------

def bf_rows_from_merge(result: MergeResult, lower: int, upper: int,
                       nb_samples: int, threads: int = 1) -> np.ndarray:
    """Dense vertical BF rows for hashes in [lower, upper].

    Row index == hash - lower; rows for absent or non-kept hashes are zero
    (write_as_bf semantics, merge.hpp:575-600).

    ``threads`` parallelizes the packbits + row scatter over contiguous
    hash slices (keys are sorted and unique, so target row ranges are
    disjoint; numpy releases the GIL on both kernels) — bloom-scale
    windows (16M rows x 50 samples) are memory-bandwidth bound.
    """
    window = upper - lower + 1
    nb = (nb_samples + 7) // 8
    rows = np.zeros((window, nb), dtype=np.uint8)
    kept = result.keep
    if not kept.any():
        return rows
    hashes = result.keys[kept].astype(np.int64) - lower
    cs = result.counts if kept.all() else result.counts[kept]
    if cs.dtype != np.uint8 and cs.dtype != np.bool_:
        # packbits only takes u8/bool; the pipeline hands the
        # narrowed (u8) fetch here so this copy is the exception
        cs = (cs > 0)

    from kmtricks_tpu import native
    if native.bf_fill(cs, hashes, rows, threads=threads):
        # fused native pack+scatter (one pass, ~3x the numpy pair)
        return rows

    def fill(lo, hi):
        rows[hashes[lo:hi]] = np.packbits(cs[lo:hi], axis=1,
                                          bitorder="little")

    n = len(hashes)
    if threads <= 1 or n < (1 << 18):
        fill(0, n)
        return rows
    from concurrent.futures import ThreadPoolExecutor
    step = -(-n // threads)
    with ThreadPoolExecutor(max_workers=threads) as ex:
        list(ex.map(lambda lo: fill(lo, min(n, lo + step)),
                    range(0, n, step)))
    return rows


def pack_counting_bf(counts: np.ndarray, w: int) -> np.ndarray:
    """Counting-BF log2 packing (packc.hpp:16-43): value stored per sample is
    min(ceil(log2(c+1)), 2^w - 1) in w bits.

    Bit order: bitpacker numbers bit 0 as the MSB of byte 0 and stores the
    value big-endian within its field (bitpacker.hpp:191-229) — i.e.
    MSB-first, UNLIKE the LSB-first BITSET order of the plain bf rows
    (utils.hpp:52-55). Byte-verified against the reference's own pack_v
    compiled from packc.hpp + the vendored bitpacker (test_units.py)."""
    c = counts.astype(np.uint64)
    lg = np.ceil(np.log2(c.astype(np.float64) + 1.0)).astype(np.uint64)
    maxv = (1 << w) - 1
    vals = np.minimum(lg, maxv).astype(np.uint8)
    n, nsamp = vals.shape
    bits = np.zeros((n, nsamp * w), dtype=np.uint8)
    for j in range(w):
        bits[:, j::w] = (vals >> (w - 1 - j)) & 1
    return np.packbits(bits, axis=1, bitorder="big")
