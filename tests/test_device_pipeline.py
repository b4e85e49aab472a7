"""Device encode+count parity: vs host golden ops and reference fixtures."""

import random

import numpy as np
import pytest

from kmtricks_tpu.core import kmer as K
from kmtricks_tpu.core.repartition import Repartition
from kmtricks_tpu.host.ops import count_sequences
from kmtricks_tpu.ops.pipeline import count_sample_device

random.seed(99)


def rand_reads(n, lo=40, hi=150, alphabet="ACGT"):
    return [("".join(random.choice(alphabet) for _ in range(random.randint(lo, hi)))).encode()
            for _ in range(n)]


def assert_same(dev, host, nb_parts):
    for p in range(nb_parts):
        dk, dc = dev.partitions.get(p, (np.zeros((0, 1), np.uint64), np.zeros(0)))
        hk, hc = host.partitions.get(p, (np.zeros((0, 1), np.uint64), np.zeros(0)))
        assert dk.shape == hk.shape, (p, dk.shape, hk.shape)
        assert (np.asarray(dk) == np.asarray(hk)).all()
        assert (np.asarray(dc) == np.asarray(hc)).all()


@pytest.mark.parametrize("k,m", [(31, 10), (21, 8), (32, 10), (11, 5)])
def test_device_vs_host_kmer_mode(k, m):
    reads = rand_reads(30) + rand_reads(5, alphabet="ACGTN")  # some N windows
    rep = Repartition.from_xxh(7, m)
    host = count_sequences(reads, k, m, rep.table, hard_min=2, mode="kmer")
    dev = count_sample_device(reads, k, m, rep.table, hard_min=2, mode="kmer")
    assert_same(dev, host, 7)


@pytest.mark.parametrize("window_bits", [250048, 1 << 40])
def test_device_vs_host_hash_mode(window_bits):
    reads = rand_reads(30)
    rep = Repartition.from_xxh(5, 10)
    host = count_sequences(reads, 31, 10, rep.table, hard_min=1, mode="hash",
                           window_bits=window_bits)
    dev = count_sample_device(reads, 31, 10, rep.table, hard_min=1,
                              mode="hash", window_bits=window_bits)
    assert_same(dev, host, 5)


def test_device_fixture_byte_equality(reference_data):
    rep = Repartition.load(
        str(reference_data / "repart_gatb" / "repartition.minimRepart"))
    from kmtricks_tpu.io.formats import read_hash_file, read_kmer_file
    for i, name in ((1, "D1"), (2, "D2")):
        seqs = [l.strip().encode() for l in open(reference_data / f"{i}.fasta")
                if not l.startswith(">")]
        dev = count_sample_device(seqs, 31, 10, rep.table, hard_min=1)
        devh = count_sample_device(seqs, 31, 10, rep.table, hard_min=1,
                                   mode="hash", window_bits=250048)
        for p in range(4):
            _, km, c = read_kmer_file(str(
                reference_data / "partitions" / "kmers" / f"partition_{p}"
                / f"{name}.kmer"))
            gk, gc = dev.partitions[p]
            assert (gk == km).all() and (gc == c).all()
            _, h, c2 = read_hash_file(str(
                reference_data / "partitions" / "hashes" / f"partition_{p}"
                / f"{name}.hash"))
            gh, ghc = devh.partitions[p]
            assert (gh == h).all() and (ghc == c2).all()


def test_device_empty_and_short():
    rep = Repartition.from_xxh(4, 10)
    out = count_sample_device([], 31, 10, rep.table)
    assert out.partitions == {}
    out = count_sample_device([b"ACGT"], 31, 10, rep.table)
    assert out.partitions == {}
