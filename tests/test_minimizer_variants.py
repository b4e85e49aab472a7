"""Frequency-ordered minimizers (--minimizer-type 1) and lexicographic
repartition (--repartition-type 1)."""

import numpy as np
import pytest

from kmtricks_tpu.core import kmer as kops
from kmtricks_tpu.core.repartition import Repartition
from kmtricks_tpu.io import formats as F
from kmtricks_tpu.runtime.pipeline import PipelineOptions, run_pipeline


def test_window_minimizers_freq_bruteforce():
    rng = np.random.default_rng(0)
    k, m = 15, 4
    rg = 4 ** m
    freq = rng.permutation(rg).astype(np.uint64)
    codes = rng.integers(0, 4, 60).astype(np.uint8)
    got = kops.window_minimizers(codes, k, m, freq_order=freq)
    masked = kops.masked_mmers(codes, m)
    for i, g in enumerate(got):
        window = masked[i:i + k - m + 1]
        ranks = freq[window.astype(np.int64)]
        best = min(zip(ranks, window))
        assert int(g) == int(best[1])


def test_repartition_lexi_properties():
    rng = np.random.default_rng(1)
    bins = rng.integers(0, 100, 4 ** 4).astype(np.int64)
    r = Repartition.from_bin_sizes_lexi(bins, 4)
    # contiguous, nondecreasing partition ranges
    assert (np.diff(r.table.astype(np.int64)) >= 0).all()
    assert r.table.max() <= 3


def test_freq_groups_unseen_to_last():
    bins = np.zeros(4 ** 3, dtype=np.int64)
    bins[5] = 10
    bins[17] = 20
    r = Repartition.from_freq_groups([(10, 5), (20, 17)], bins, 4)
    assert r.table[0] == 3          # unseen -> last partition
    assert r.table[5] in range(4)


@pytest.fixture()
def fof_path(tmp_path):
    import pathlib
    ref = pathlib.Path("/root/reference/tests/data")
    if not ref.exists():
        pytest.skip("reference data not available")
    p = tmp_path / "t.fof"
    p.write_text(f"D1 : {ref}/1.fasta\nD2 : {ref}/2.fasta\n")
    return str(p)


@pytest.mark.parametrize("minim_type,repart_type", [(1, 0), (0, 1)])
def test_pipeline_minimizer_variants(tmp_path, fof_path, minim_type,
                                     repart_type):
    """The golden merged k-mer SET is invariant to routing choices: freq
    minimizers / lexi repartition only move k-mers between partitions."""
    opts = PipelineOptions(
        fof=fof_path, run_dir=str(tmp_path / "run"), kmer_size=31,
        hard_min=1, soft_min="1", mode="kmer:count:bin",
        minim_type=minim_type, repart_type=repart_type, nb_partitions=4)
    kmdir = run_pipeline(opts)
    total = 0
    all_kmers = []
    for p in range(4):
        _, kk, _cc = F.read_matrix_file(
            kmdir.get_matrix_path(p, "count", "bin", "kmer", False))
        total += len(kk)
        all_kmers.append(kk[:, 0])
    assert total == 57 + 67 + 70 + 82
    cat = np.concatenate(all_kmers)
    assert len(np.unique(cat)) == total
    if minim_type == 1:
        # freq sidecar persisted and reloadable
        r = Repartition.load(kmdir.repart_path)
        assert r.freq is not None


def test_kxmer_lpt_weights_brute_force(tmp_path):
    """sample_minimizer_bins tallies kx-mers exactly as SampleRepart
    (RepartitionAlgorithm.cpp:158-243): new kxmer on strand flip or after
    4 k-mers, within superkmer runs broken by minimizer change or an
    invalid window."""
    import numpy as np

    from kmtricks_tpu.core import kmer as kops
    from kmtricks_tpu.runtime.config import Config
    from kmtricks_tpu.runtime.kmdir import KmDir
    from kmtricks_tpu.runtime.pipeline import sample_minimizer_bins

    rng = np.random.default_rng(8)
    k, m = 11, 4
    reads = []
    for _ in range(30):
        reads.append("".join(rng.choice(list("ACGTN"), size=60,
                                        p=[.24, .24, .24, .24, .04])))
    fa = tmp_path / "r.fasta"
    fa.write_text("".join(f">s{i}\n{r}\n" for i, r in enumerate(reads)))
    fof = tmp_path / "t.fof"
    fof.write_text(f"S : {fa}\n")
    kmdir = KmDir.init(str(tmp_path / "run"), str(fof), True)
    config = Config(kmer_size=k, minim_size=m, seq_number=30)
    bins = sample_minimizer_bins(kmdir, config)

    # brute force per read
    exp = np.zeros(4 ** m, dtype=np.int64)
    for r in reads:
        codes, valid = kops.encode_ascii(r.encode())
        if len(codes) < k:
            continue
        wv = kops.window_validity(valid, k)
        minim = kops.window_minimizers(codes, k, m)
        fwd = kops.kmers_from_codes(codes, k)
        which = ~kops.compare_lt(kops.revcomp(fwd, k), fwd)
        prev_min, prev_which, kx = None, None, 0
        for i in range(len(minim)):
            if not wv[i]:
                prev_min = None
                continue
            if prev_min is None or minim[i] != prev_min:
                exp[minim[i]] += 1          # superkmer restart -> new kxmer
                kx = 1
            elif which[i] != prev_which or kx >= 4:
                exp[minim[i]] += 1
                kx = 1
            else:
                kx += 1
            prev_min, prev_which = minim[i], which[i]
    assert (bins == exp).all()
