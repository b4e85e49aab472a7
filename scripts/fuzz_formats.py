"""Randomized on-disk format roundtrip fuzz: every §2.3 writer/reader pair.

Draws random record sets (including empty files, single records, count-type
widths 1/2/4, sizes straddling the 32KB .hash block boundary, random
compression) and asserts write -> read returns identical data, that
``get_km_file_type`` sniffs every produced file, and that the ``dump``
module renders text for each dumpable type. Run:

    python scripts/fuzz_formats.py [n_cases] [seed]

Any failure prints the case seed for reproduction.
"""
import os
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import numpy as np

from kmtricks_tpu.core.histogram import KHist
from kmtricks_tpu.io import formats as F
from kmtricks_tpu.io import kff as KFF
from kmtricks_tpu.io import lz4 as LZ4
from kmtricks_tpu.io import p4 as P4

HB = F.HASH_BLOCK


def _sizes(rng):
    return int(rng.choice([0, 1, 2, 37, 1000, HB - 1, HB, HB + 1,
                           2 * HB + 17]))


def case(seed: int) -> None:
    rng = np.random.default_rng(seed)
    k = int(rng.choice([11, 21, 31, 32, 33, 63, 64, 65, 96, 127, 128]))
    slots = (k + 31) // 32
    cb = int(rng.choice([1, 2, 4]))
    cdt = {1: np.uint8, 2: np.uint16, 4: np.uint32}[cb]
    cmax = np.iinfo(cdt).max
    n = _sizes(rng)
    nsamp = int(rng.integers(1, 9))
    comp = bool(rng.random() < 0.5)
    sid, part = int(rng.integers(0, 100)), int(rng.integers(0, 64))

    kmers = rng.integers(0, 1 << 63, (n, slots), dtype=np.uint64)
    # keep only the key's 2k bits in the HIGH word — rows are
    # little-endian, high word last (writer contract)
    top = 2 * k - 64 * (slots - 1)
    if top < 64:
        kmers[:, -1] &= np.uint64((1 << top) - 1) if top else np.uint64(0)
    counts = rng.integers(1, cmax + 1, n).astype(cdt)
    hashes = np.sort(rng.integers(0, 1 << 62, n, dtype=np.uint64))

    with tempfile.TemporaryDirectory() as d:
        def p(name):
            return os.path.join(d, name)

        # .kmer
        F.write_kmer_file(p("a.kmer"), kmers, counts, k, cb, sid, part, comp)
        info, rk, rc = F.read_kmer_file(p("a.kmer"))
        assert (info.kmer_size, info.id, info.partition) == (k, sid, part)
        assert (rk == kmers).all() and (rc == counts).all()
        assert F.get_km_file_type(p("a.kmer")) == "kmer"

        # .hash (raw and p4)
        F.write_hash_file(p("a.hash"), hashes, counts, cb, sid, part, comp)
        hinfo, rh, rc2 = F.read_hash_file(p("a.hash"))
        assert hinfo.compressed == comp
        assert (rh == hashes).all() and (rc2 == counts).all()
        assert F.get_km_file_type(p("a.hash")) == "hash"

        # .count matrix
        mc = rng.integers(0, cmax + 1, (n, nsamp)).astype(cdt)
        F.write_matrix_file(p("a.count"), kmers, mc, k, cb, sid, part, comp)
        minfo, mk, mcc = F.read_matrix_file(p("a.count"), count_bytes=cb)
        assert (mk == kmers).all() and (mcc == mc).all()
        assert minfo.nb_counts == nsamp
        assert F.get_km_file_type(p("a.count")) == "matrix"

        # .count_hash
        F.write_matrix_hash_file(p("a.count_hash"), hashes, mc, cb, sid,
                                 part, comp)
        _, hk, hcc = F.read_matrix_hash_file(p("a.count_hash"))
        assert (hk == hashes).all() and (hcc == mc).all()

        # .pa / .pa_hash
        pa = F.pack_pa_bits(rng.integers(0, 2, (n, nsamp)).astype(bool))
        F.write_pa_matrix_file(p("a.pa"), kmers, pa, k, nsamp, sid, part,
                               comp)
        _, pk, prows = F.read_pa_matrix_file(p("a.pa"))
        assert (pk == kmers).all() and (prows == pa).all()
        F.write_pa_hash_matrix_file(p("a.pa_hash"), hashes, pa, nsamp, sid,
                                    part, comp)
        _, phk, phr = F.read_pa_hash_matrix_file(p("a.pa_hash"))
        assert (phk == hashes).all() and (phr == pa).all()

        # .vector + .cmbf
        bits = int(rng.integers(1, 200))
        vec = rng.integers(0, 256, F.nbytes(bits), dtype=np.uint8)
        F.write_bit_vector_file(p("a.vector"), vec, bits, sid, part, comp)
        (vb, _, _), rv = F.read_bit_vector_file(p("a.vector"))
        assert vb == bits and (rv == vec).all()

        window = int(rng.integers(1, 500))
        rows = rng.integers(0, 256, (window, F.nbytes(nsamp)),
                            dtype=np.uint8)
        first = int(rng.integers(0, 1 << 40))
        F.write_vector_matrix_file(p("a.cmbf"), rows, nsamp, sid, part,
                                   first, window, comp)
        vmi, rrows = F.read_vector_matrix_file(p("a.cmbf"))
        assert (vmi.first, vmi.window) == (first, window)
        assert (rrows == rows).all()
        if not comp:    # random row access (uncompressed only, like the
            lo = int(rng.integers(0, window))            # reference seekg)
            hi = int(rng.integers(lo, window))
            _, sub = F.read_vector_matrix_rows(p("a.cmbf"), lo, hi - lo)
            assert (sub == rows[lo:hi]).all()

        # .hist
        h = KHist(sid, k)
        h.inc_counts(rng.integers(1, 300, max(n, 1)))
        F.write_hist_file(p("a.hist"), h, comp)
        hi2, hu, hn = F.read_hist_file(p("a.hist"))
        assert (hu == h.hist_u).all() and (hn == h.hist_n).all()
        assert hi2.uniq == h.uniq and hi2.total == h.total

        # KFF raw roundtrip (count_bytes 1/2/4)
        if n:
            KFF.write_kff_file(p("a.kff"), kmers, counts, k, cb)
            vars_, recs = KFF.read_kff_file(p("a.kff"))
            assert vars_["k"] == k and len(recs) == n
            from kmtricks_tpu.core.kmer import kmers_to_strings
            want = kmers_to_strings(kmers, k)
            assert [s for s, _ in recs] == list(want)
            assert [c for _, c in recs] == [int(c) for c in counts]

        # p4 codecs directly (delta hashes + zigzag-free counts)
        assert (P4.p4nd1dec64(P4.p4nd1enc64(hashes), n) == hashes).all()
        assert (P4.p4nzdec(P4.p4nzenc(counts, cb), n, cb) == counts).all()

        # lz4 frame roundtrip on random binary
        blob = rng.integers(0, 256, int(rng.integers(0, 300000)),
                            dtype=np.uint8).tobytes()
        assert LZ4.decompress(LZ4.compress(blob)) == blob


def main():
    n_cases = int(sys.argv[1]) if len(sys.argv) > 1 else 50
    seed0 = int(sys.argv[2]) if len(sys.argv) > 2 else 0
    for i in range(n_cases):
        seed = seed0 + i
        try:
            case(seed)
        except Exception:
            print(f"FAIL seed={seed}", flush=True)
            raise
        print(f"OK case {i} (seed {seed})", flush=True)


if __name__ == "__main__":
    main()
