"""Host-side exact k-mer codec, vectorized with numpy.

Semantics contract (verified against the reference implementation):

* 2-bit codes A=0, C=1, T=2, G=3 (reference include/kmtricks/kmer.hpp:38-49).
* A k-mer is the base-4 polynomial of its codes: first nucleotide in the
  highest bits. Multi-word k-mers (k > 32) are little-endian ``uint64``
  word arrays of size ``slots = ceil(k/32)`` (kmer.hpp:164-630).
* ``revcomp``: reverse the 2-bit groups and complement each (code ^ 2)
  (kmer.hpp:521-535, 773-785).
* ``canonical`` = min(forward, revcomp) as an integer (kmer.hpp:531-535).
* Minimizer of a k-mer window (pipeline routing): each m-mer is first
  canonicalized (min of fwd/revcomp values), then replaced by the all-ones
  sentinel ``4^m - 1`` when "forbidden" (contains AA anywhere but at its
  first position, Model.hpp:1220-1249); the minimizer is the minimum of
  those masked values (_mmer_lut, Model.hpp:1032-1064).

  NOTE: fill_partitions.hpp:20 defines NONCANONICAL (which would skip the
  m-mer canonicalization), but in the reference binary's translation unit
  task.hpp includes SortingCountAlgorithm.cpp (task.hpp:28) — which pulls in
  Sequence2SuperKmer.hpp — BEFORE fill_partitions.hpp (task.hpp:34), so the
  include guard locks in ``ModelMinimizer<ModelCanonical>``: the effective,
  observable semantics are CANONICAL m-mers (verified against the committed
  count fixtures in tests/data/partitions). We reproduce the effective
  behavior matching the reference binary (whose fill_partitions.hpp:20
NONCANONICAL define is dead by include order) and its committed
fixtures; ``canonical_mmers=False`` is the dead define's intended
ModelDirect variant (the lut skips canonicalization for ModelDirect,
Model.hpp:1035-1065; GATB-executed goldens pin both).
* ``km::Kmer::minimizer`` (kmer.hpp:591-629) — the standalone API — has the
  same canonical-m-mer semantics; see :func:`minimizer_canonical_value`.
"""

from __future__ import annotations

import numpy as np

from kmtricks_tpu.constants import (
    ASCII_CODE_TABLE,
    ASCII_VALID_TABLE,
    BYTE_REVCOMP_TABLE,
    CODE_TO_BASE,
    NT_TO_CODE_TABLE,
)


def slots_for_k(k: int) -> int:
    """Number of uint64 words used to store/serialize a k-mer (= (k+31)//32)."""
    return (k + 31) // 32


# ---------------------------------------------------------------------------
# Sequence encoding
# ---------------------------------------------------------------------------

def encode_ascii(seq: bytes | str) -> tuple[np.ndarray, np.ndarray]:
    """ASCII sequence -> (codes uint8, valid bool), GATB ConvertASCII rule."""
    if isinstance(seq, str):
        seq = seq.encode()
    raw = np.frombuffer(seq, dtype=np.uint8)
    return ASCII_CODE_TABLE[raw], ASCII_VALID_TABLE[raw]


# ---------------------------------------------------------------------------
# Packing / unpacking
# ---------------------------------------------------------------------------

def _pack_windows_u64(codes: np.ndarray, w: int) -> np.ndarray:
    """Value of every width-``w`` window (w <= 32) as (L-w+1,) uint64 —
    doubling ladder: log2(w) shift-or passes instead of w. Widths <= 16
    run the ladder in uint32 (numpy's 64-bit shifts are ~25x slower than
    32-bit on SSE-only hosts) and widen once at the end."""
    if w <= 16:
        return _pack_windows_u32(codes, w).astype(np.uint64)
    ladder = {1: codes.astype(np.uint64)}
    v, p = ladder[1], 1
    while 2 * p <= w:
        v = (v[:len(v) - p] << np.uint64(2 * p)) | v[p:]
        p *= 2
        ladder[p] = v
    acc, wa = None, 0
    for p in sorted(ladder, reverse=True):   # binary decomposition of w
        if not (w & p):
            continue
        part = ladder[p]
        if acc is None:
            acc, wa = part, p
        else:
            need = len(codes) - (wa + p) + 1
            acc = (acc[:need] << np.uint64(2 * p)) | part[wa:wa + need]
            wa += p
    return acc


def _u32_ladder(codes: np.ndarray, wmax: int) -> dict:
    """Doubling ladder of uint32 window values up to width ``wmax`` —
    shared by every width derived from it (one set of shift-or passes
    instead of one per caller)."""
    ladder = {1: codes.astype(np.uint32)}
    v, p = ladder[1], 1
    while 2 * p <= wmax:
        v = (v[:len(v) - p] << np.uint32(2 * p)) | v[p:]
        p *= 2
        ladder[p] = v
    return ladder


def _pack_from_ladder(ladder: dict, n_codes: int, w: int) -> np.ndarray:
    """Width-``w`` window values from a prebuilt ladder (w <= 2*max rung)."""
    acc, wa = None, 0
    for p in sorted(ladder, reverse=True):
        if not (w & p):
            continue
        part = ladder[p]
        if acc is None:
            acc, wa = part, p
        else:
            need = n_codes - (wa + p) + 1
            acc = (acc[:need] << np.uint32(2 * p)) | part[wa:wa + need]
            wa += p
    return acc


def _pack_windows_u32(codes: np.ndarray, w: int,
                      ladder: dict | None = None) -> np.ndarray:
    """uint32 doubling ladder for window widths <= 16."""
    assert w <= 16
    if ladder is None:
        ladder = _u32_ladder(codes, w)
    return _pack_from_ladder(ladder, len(codes), w)


def kmers_from_codes(codes: np.ndarray, k: int) -> np.ndarray:
    """All k-mer windows of a code array, packed.

    Parameters
    ----------
    codes : (L,) uint8 array of 2-bit codes.
    k : k-mer size.

    Returns
    -------
    (L-k+1, slots) uint64 array, little-endian words.
    """
    n = len(codes) - k + 1
    slots = slots_for_k(k)
    if n <= 0:
        return np.zeros((0, slots), dtype=np.uint64)
    if slots == 1:
        return _pack_windows_u64(codes, k).reshape(n, 1)
    win = np.lib.stride_tricks.sliding_window_view(codes, k)  # (n, k)
    out = np.zeros((n, slots), dtype=np.uint64)
    for j in range(k):
        bitpos = 2 * (k - 1 - j)
        w, s = divmod(bitpos, 64)
        out[:, w] |= win[:, j].astype(np.uint64) << np.uint64(s)
    return out


def strings_to_kmers(strings: list[str], k: int | None = None) -> np.ndarray:
    """Pack k-mer strings (km::Kmer::set_polynom semantics, NToB table)."""
    if k is None:
        k = len(strings[0])
    out = np.zeros((len(strings), slots_for_k(k)), dtype=np.uint64)
    for i, s in enumerate(strings):
        assert len(s) == k
        codes = NT_TO_CODE_TABLE[np.frombuffer(s.encode(), dtype=np.uint8)]
        out[i] = kmers_from_codes(codes, k)[0]
    return out


def kmers_to_strings(words: np.ndarray, k: int) -> list[str]:
    """Unpack k-mers to strings (kmer.hpp to_string semantics)."""
    words = np.atleast_2d(words)
    out = []
    for row in words:
        chars = []
        for j in range(k):
            bitpos = 2 * (k - 1 - j)
            w, s = divmod(bitpos, 64)
            chars.append(CODE_TO_BASE[int(row[w] >> np.uint64(s)) & 3])
        out.append("".join(chars))
    return out


# ---------------------------------------------------------------------------
# Multi-word arithmetic helpers (vectorized over axis 0)
# ---------------------------------------------------------------------------

def _rshift_words(words: np.ndarray, r: int) -> np.ndarray:
    """Logical right shift of little-endian uint64 word arrays by r bits."""
    slots = words.shape[-1]
    word_shift, bit_shift = divmod(r, 64)
    out = np.zeros_like(words)
    for i in range(slots - word_shift):
        src = words[..., i + word_shift]
        val = src >> np.uint64(bit_shift) if bit_shift else src
        if bit_shift and i + word_shift + 1 < slots:
            val = val | (words[..., i + word_shift + 1] << np.uint64(64 - bit_shift))
        out[..., i] = val
    return out


def revcomp(words: np.ndarray, k: int) -> np.ndarray:
    """Reverse complement of packed k-mers (kmer.hpp rev_comp semantics).

    Byte-reverse the full word array, map each byte through the
    reverse-complement byte LUT, then shift right to re-align to k codes.
    """
    words = np.ascontiguousarray(words, dtype=np.uint64)
    squeeze = words.ndim == 1
    words2 = np.atleast_2d(words)
    n, slots = words2.shape
    b = words2.view(np.uint8).reshape(n, slots * 8)  # little-endian bytes
    rb = BYTE_REVCOMP_TABLE[b[:, ::-1]]
    rwords = np.ascontiguousarray(rb).view(np.uint64).reshape(n, slots)
    rwords = _rshift_words(rwords, 2 * (32 * slots - k))
    return rwords[0] if squeeze else rwords


def compare_lt(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Lexicographic a < b for little-endian multi-word uint64 arrays."""
    a2, b2 = np.atleast_2d(a), np.atleast_2d(b)
    slots = a2.shape[-1]
    lt = np.zeros(a2.shape[0], dtype=bool)
    decided = np.zeros(a2.shape[0], dtype=bool)
    for i in range(slots - 1, -1, -1):  # most significant word first
        wi_lt = a2[:, i] < b2[:, i]
        wi_ne = a2[:, i] != b2[:, i]
        lt = np.where(~decided & wi_ne, wi_lt, lt)
        decided |= wi_ne
    return lt if a.ndim > 1 else lt[0]


def canonical(words: np.ndarray, k: int) -> np.ndarray:
    """min(kmer, revcomp(kmer)) per row."""
    rc = revcomp(words, k)
    w2, rc2 = np.atleast_2d(words), np.atleast_2d(rc)
    take_rc = compare_lt(rc2, w2)
    out = np.where(take_rc[:, None], rc2, w2)
    return out[0] if words.ndim == 1 else out


# ---------------------------------------------------------------------------
# Minimizers
# ---------------------------------------------------------------------------

def is_allowed_minimizer(values: np.ndarray, m: int) -> np.ndarray:
    """GATB ``is_allowed`` (Model.hpp:1220-1249): forbid m-mers containing
    'AA' anywhere except starting at the first position.

    Bit trick: a code pair (00,00) at adjacent positions i,i+1 shows up as a
    pair of set bits after ``~(v | v>>2)``; the mask keeps only positions
    excluding the first two characters' high bits.
    """
    if m <= 16:
        # u32 fast path (numpy 64-bit shifts are ~25x slower on this
        # class of host)
        v = values.astype(np.uint32)
        mask1 = np.uint32((1 << (2 * m - 4)) - 1) if m >= 2 else \
            np.uint32(0)
        mask00 = np.uint32(0x55555555) & mask1
        a = ~(v | (v >> np.uint32(2)))
        a = ((a >> np.uint32(1)) & a) & mask00
        return a == 0
    v = values.astype(np.uint64)
    mask1 = np.uint64((1 << (2 * m - 4)) - 1) if m >= 2 else np.uint64(0)
    mask00 = np.uint64(0x5555555555555555) & mask1
    a = ~(v | (v >> np.uint64(2)))
    a = ((a >> np.uint64(1)) & a) & mask00
    return a == 0


def strand_is_forward(codes: np.ndarray, k: int,
                      ladder: dict | None = None) -> np.ndarray:
    """True per k-mer window iff the canonical strand is the forward one
    (NOT revcomp < forward — GATB comparator semantics). For k <= 32 the
    comparison runs entirely in uint32 half-mers: the first 16 codes of
    the reverse complement are the revcomp of the window's LAST 16 codes,
    so rc < fwd decides on (revcomp(tail16) vs head16) with a
    (revcomp(head b) vs tail b) tie-break — no 64-bit ops."""
    n = len(codes) - k + 1
    if n <= 0:
        return np.zeros((0,), dtype=bool)
    if k > 32:
        fwd = kmers_from_codes(codes, k)
        return ~compare_lt(revcomp(fwd, k), fwd)
    a = min(16, k)
    b = k - a
    A = _pack_windows_u32(codes, a, ladder)
    Ra = _mmer_revcomp_u32(A[k - a:], a)
    if b == 0:
        return ~(Ra[:n] < A[:n])
    Bv = _pack_windows_u32(codes, b, ladder)
    Rb = _mmer_revcomp_u32(Bv[:n], b)
    B = Bv[a:a + n]
    lt = (Ra[:n] < A[:n]) | ((Ra[:n] == A[:n]) & (Rb < B))
    return ~lt


def _mmer_revcomp_u32(v: np.ndarray, m: int) -> np.ndarray:
    """uint32 in/out revcomp of m-mer values (m <= 16) — see
    mmer_revcomp_values."""
    assert m <= 16
    v = v.astype(np.uint32) ^ np.uint32(0xAAAAAAAA)
    v = ((v >> np.uint32(2)) & np.uint32(0x33333333)) | \
        ((v & np.uint32(0x33333333)) << np.uint32(2))
    v = ((v >> np.uint32(4)) & np.uint32(0x0F0F0F0F)) | \
        ((v & np.uint32(0x0F0F0F0F)) << np.uint32(4))
    v = ((v >> np.uint32(8)) & np.uint32(0x00FF00FF)) | \
        ((v & np.uint32(0x00FF00FF)) << np.uint32(8))
    v = (v >> np.uint32(16)) | (v << np.uint32(16))
    return v >> np.uint32(32 - 2 * m)


def mmer_revcomp_values(values: np.ndarray, m: int) -> np.ndarray:
    """Reverse complement of m-mer integer values (m <= 16) — SWAR:
    complement every 2-bit group (XOR 0b10), reverse group order with
    four masked swaps, right-align."""
    assert m <= 16
    v = values.astype(np.uint32) ^ np.uint32(0xAAAAAAAA)
    v = ((v >> np.uint32(2)) & np.uint32(0x33333333)) | \
        ((v & np.uint32(0x33333333)) << np.uint32(2))
    v = ((v >> np.uint32(4)) & np.uint32(0x0F0F0F0F)) | \
        ((v & np.uint32(0x0F0F0F0F)) << np.uint32(4))
    v = ((v >> np.uint32(8)) & np.uint32(0x00FF00FF)) | \
        ((v & np.uint32(0x00FF00FF)) << np.uint32(8))
    v = (v >> np.uint32(16)) | (v << np.uint32(16))
    return (v >> np.uint32(32 - 2 * m)).astype(np.uint64)


def mmers_from_codes(codes: np.ndarray, m: int) -> np.ndarray:
    """All forward m-mer integer values of a code array -> (L-m+1,) uint64."""
    n = len(codes) - m + 1
    if n <= 0:
        return np.zeros((0,), dtype=np.uint64)
    return _pack_windows_u64(codes, m)


def _sliding_min(a: np.ndarray, w: int) -> np.ndarray:
    """Minimum of every width-``w`` window -> (len(a)-w+1,) — sparse-table
    doubling (idempotent overlap): log2(w) passes instead of w."""
    g, p = a, 1
    while 2 * p <= w:
        g = np.minimum(g[:len(g) - p], g[p:])
        p *= 2
    n = len(a) - w + 1
    return np.minimum(g[:n], g[w - p:w - p + n])


def masked_mmers(codes: np.ndarray, m: int,
                 canonical_mmers: bool = True) -> np.ndarray:
    """m-mers through the _mmer_lut (Model.hpp:1040-1064): canonicalize
    (unless ``canonical_mmers=False``), then value if allowed, else the
    all-ones sentinel 4^m - 1."""
    vals = mmers_from_codes(codes, m)
    if canonical_mmers:
        vals = np.minimum(vals, mmer_revcomp_values(vals, m))
    sentinel = np.uint64((1 << (2 * m)) - 1)
    return np.where(is_allowed_minimizer(vals, m), vals, sentinel)


def window_minimizers(codes: np.ndarray, k: int, m: int,
                      canonical_mmers: bool = True,
                      freq_order: np.ndarray | None = None,
                      ladder: dict | None = None) -> np.ndarray:
    """Minimizer value of every k-mer window (pipeline routing semantics).

    Returns (L-k+1,) uint64: min over the k-m+1 masked canonical m-mers of
    each window. Matches GATB computeNewMinimizerOriginal over the effective
    ModelMinimizer<ModelCanonical> (see module docstring).

    With ``freq_order`` (--minimizer-type 1): m-mers compare by sampled
    frequency rank first, value second (ComparatorMinimizerFrequencyOrLex,
    Model.hpp:911-976); the masked sentinel 4^m - 1 is pinned to the highest
    rank (RepartitionAlgorithm.cpp:380).
    """
    nk = len(codes) - k + 1
    if nk <= 0:
        return np.zeros((0,), dtype=np.uint64)
    per_window = k - m + 1
    if freq_order is None and m <= 16:
        # all-u32 path: values < 4^16 and numpy 64-bit compares/shifts
        # are ~25x slower than 32-bit on SSE-only hosts
        vals = _pack_windows_u32(codes, m, ladder)
        cano = np.minimum(vals, _mmer_revcomp_u32(vals, m)) \
            if canonical_mmers else vals
        sentinel = np.uint32((1 << (2 * m)) - 1)
        masked32 = np.where(is_allowed_minimizer(cano, m), cano, sentinel)
        return _sliding_min(masked32, per_window)[:nk].astype(np.uint64)
    masked = masked_mmers(codes, m, canonical_mmers)
    if freq_order is None:
        return _sliding_min(masked, per_window)[:nk]
    shift = np.uint64(2 * m)
    ranked = (freq_order[masked.astype(np.int64)].astype(np.uint64)
              << shift) | masked
    return _sliding_min(ranked, per_window)[:nk] & np.uint64((1 << (2 * m)) - 1)


def minimizer_canonical_value(words: np.ndarray, k: int, m: int) -> np.ndarray:
    """km::Kmer::minimizer semantics (kmer.hpp:591-629): each m-mer is
    canonicalized (min of fwd/revcomp) BEFORE the forbidden test; forbidden
    m-mers are replaced by the sentinel 4^m - 1.

    Returns (N,) uint64 minimizer values for packed k-mers.
    """
    words2 = np.atleast_2d(words)
    n = words2.shape[0]
    nb = k - m + 1
    sentinel = np.uint64((1 << (2 * m)) - 1)
    result = np.full(n, np.iinfo(np.uint32).max, dtype=np.uint64)
    for i in range(nb):
        # m-mer spanning string positions [i, i+m): bits [2*(k-m-i), ...)
        vals = np.zeros(n, dtype=np.uint64)
        for j in range(m):
            bitpos = 2 * (k - 1 - (i + j))
            w, s = divmod(bitpos, 64)
            vals = (vals << np.uint64(2)) | ((words2[:, w] >> np.uint64(s)) & np.uint64(3))
        rc = mmer_revcomp_values(vals, m)
        cano = np.minimum(vals, rc)
        masked = np.where(is_allowed_minimizer(cano, m), cano, sentinel)
        result = np.minimum(result, masked)
    return result if words.ndim > 1 else result[:1]


def window_validity(valid: np.ndarray, k: int) -> np.ndarray:
    """(L,) per-char validity -> (L-k+1,) per-window validity (all k valid).
    Sliding-AND via sparse-table doubling: log2(k) passes."""
    nk = len(valid) - k + 1
    if nk <= 0:
        return np.zeros((0,), dtype=bool)
    g, p = np.asarray(valid, dtype=bool), 1
    while 2 * p <= k:
        g = g[:len(g) - p] & g[p:]
        p *= 2
    return g[:nk] & g[k - p:k - p + nk]
