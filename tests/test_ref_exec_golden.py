"""Golden tests against REFERENCE-EXECUTED outputs.

The fixtures in tests/data_ref_exec/ were produced by compiling and
running the reference's own standalone headers (kmer.hpp, minimizer.hpp,
bitmatrix.hpp + the vendored sse2neon/bitpacker) — see
scripts/gen_ref_exec_golden.py. Unlike the committed-file fixtures
(tests/data of the reference), these cover random and adversarial inputs
at every k span, so they pin the semantics of our implementations to the
reference's actual behavior, not to our reading of its code."""

import os
import struct

import numpy as np
import pytest

from kmtricks_tpu.core import kmer as K
from kmtricks_tpu.core.bitmatrix import transpose_bits

DATA = os.path.join(os.path.dirname(__file__), "data_ref_exec")


def _rows():
    with open(os.path.join(DATA, "kmer_golden.tsv")) as f:
        for line in f:
            k, m, seq, fwd, canon, rc, minim = line.rstrip("\n").split("\t")
            yield (int(k), int(m), seq,
                   np.array([int(w, 16) for w in fwd.split(",")],
                            dtype=np.uint64),
                   np.array([int(w, 16) for w in canon.split(",")],
                            dtype=np.uint64),
                   rc, int(minim))


def test_kmer_golden_vs_reference_execution():
    by_km = {}
    for k, m, seq, fwd, canon, rc, minim in _rows():
        by_km.setdefault((k, m), []).append((seq, fwd, canon, rc, minim))
    assert len(by_km) >= 30
    for (k, m), rows in by_km.items():
        seqs = [r[0] for r in rows]
        words = K.strings_to_kmers(seqs, k)
        nw = (k + 31) // 32
        assert words.shape == (len(seqs), nw)
        fwd = np.stack([r[1] for r in rows])
        canon = np.stack([r[2] for r in rows])
        np.testing.assert_array_equal(words, fwd,
                                      err_msg=f"fwd words k={k}")
        np.testing.assert_array_equal(K.canonical(words, k), canon,
                                      err_msg=f"canonical k={k}")
        assert K.kmers_to_strings(K.revcomp(words, k), k) == \
            [r[3] for r in rows], f"revcomp k={k}"
        got_min = K.minimizer_canonical_value(words, k, m)
        np.testing.assert_array_equal(
            got_min, np.array([r[4] for r in rows], dtype=np.uint64),
            err_msg=f"minimizer k={k} m={m}")


@pytest.mark.parametrize("m", [4, 6, 8])
def test_minimizer_validity_vs_reference_execution(m):
    with open(os.path.join(DATA, f"minim_valid_m{m}.bin"), "rb") as f:
        mask = np.frombuffer(f.read(), dtype=np.uint8)
    want = np.unpackbits(mask, bitorder="little")[:4 ** m].astype(bool)
    got = K.is_allowed_minimizer(np.arange(4 ** m, dtype=np.uint64), m)
    np.testing.assert_array_equal(got, want)


def test_bitmatrix_transpose_vs_reference_execution():
    blob = open(os.path.join(DATA, "bitmatrix_golden.bin"), "rb").read()
    off = 0
    ncase = 0
    while off < len(blob):
        n, nbytes, tlen = struct.unpack_from("<III", blob, off)
        off += 12
        data = np.frombuffer(blob[off:off + n * nbytes],
                             dtype=np.uint8).reshape(n, nbytes)
        off += n * nbytes
        want = np.frombuffer(blob[off:off + tlen], dtype=np.uint8)
        off += tlen
        got = transpose_bits(data)
        assert got.reshape(-1).shape == want.shape
        np.testing.assert_array_equal(got.reshape(-1), want,
                                      err_msg=f"case n={n} nbytes={nbytes}")
        ncase += 1
    assert ncase == 4
