"""Core k-mer codec invariants (mirrors reference tests/kmer_test.cpp)."""

import random

import numpy as np
import pytest

from kmtricks_tpu.core import kmer as K

random.seed(42)

COMP = {"A": "T", "C": "G", "G": "C", "T": "A"}
ORDER = {"A": 0, "C": 1, "T": 2, "G": 3}


def rc_str(s):
    return "".join(COMP[c] for c in reversed(s))


def rand_seq(n):
    return "".join(random.choice("ACGT") for _ in range(n))


@pytest.mark.parametrize("k", [5, 21, 31, 32, 33, 47, 64, 65, 97, 127])
def test_pack_roundtrip_and_revcomp(k):
    seqs = [rand_seq(k) for _ in range(32)]
    w = K.strings_to_kmers(seqs, k)
    assert K.kmers_to_strings(w, k) == seqs
    assert K.kmers_to_strings(K.revcomp(w, k), k) == [rc_str(s) for s in seqs]
    # revcomp is an involution
    assert (K.revcomp(K.revcomp(w, k), k) == w).all()


@pytest.mark.parametrize("k", [21, 31, 33, 64])
def test_canonical(k):
    seqs = [rand_seq(k) for _ in range(32)]
    w = K.strings_to_kmers(seqs, k)
    got = K.kmers_to_strings(K.canonical(w, k), k)
    exp = [min(s, rc_str(s), key=lambda x: [ORDER[c] for c in x]) for s in seqs]
    assert got == exp


def test_encode_ascii_validity():
    codes, valid = K.encode_ascii(b"ACGTNacgtnX")
    assert codes[:4].tolist() == [0, 1, 3, 2]
    assert valid.tolist() == [True] * 4 + [False] + [True] * 4 + [False, False]


def _is_allowed_bruteforce(v, m):
    s = [(v >> (2 * (m - 1 - i))) & 3 for i in range(m)]
    return not any(s[i] == 0 and s[i + 1] == 0 for i in range(1, m - 1))


@pytest.mark.parametrize("m", [4, 6, 8])
def test_is_allowed(m):
    vals = np.arange(4 ** m, dtype=np.uint64)
    got = K.is_allowed_minimizer(vals, m)
    exp = np.array([_is_allowed_bruteforce(int(v), m) for v in vals])
    assert (got == exp).all()


@pytest.mark.parametrize("k,m", [(31, 10), (20, 8), (15, 4)])
def test_window_minimizers_bruteforce(k, m):
    s = rand_seq(300)
    codes, _ = K.encode_ascii(s)
    got = K.window_minimizers(codes, k, m)
    sentinel = (1 << (2 * m)) - 1
    exp = []
    for i in range(len(s) - k + 1):
        best = sentinel
        for j in range(k - m + 1):
            sub = s[i + j:i + j + m]
            v = 0
            for c in sub:
                v = v * 4 + ORDER[c]
            r = 0
            t = v
            for _ in range(m):
                r = (r << 2) | ((t & 3) ^ 2)
                t >>= 2
            v = min(v, r)
            if not _is_allowed_bruteforce(v, m):
                v = sentinel
            best = min(best, v)
        exp.append(best)
    assert got.tolist() == exp


def test_window_validity():
    codes, valid = K.encode_ascii(b"ACGTNACGTACGT")
    wv = K.window_validity(valid, 4)
    # windows touching index 4 (N) are invalid
    assert wv.tolist() == [True, False, False, False, False,
                           True, True, True, True, True]
