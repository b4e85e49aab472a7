"""k > 32 device path (4/6/8-word u32 keys, spans 64/96/128 matching the
reference KMER_LIST): parity vs the host golden path."""

import numpy as np
import jax.numpy as jnp
import pytest

from kmtricks_tpu.core.repartition import Repartition
from kmtricks_tpu.host.ops import count_sequences, merge_partition
from kmtricks_tpu.ops.encode import encode_batch_wide
from kmtricks_tpu.ops.merge import merge_partition_device
from kmtricks_tpu.ops.pipeline import count_sample_device
from kmtricks_tpu.runtime.pipeline import PipelineOptions, run_pipeline

M = 10
NB_PARTS = 4
WINDOW = 250048


def random_reads(rng, n, lo=70, hi=180):
    return [bytes(rng.choice(np.frombuffer(b"ACGTN", dtype=np.uint8),
                             size=int(rng.integers(lo, hi)),
                             p=[.24, .24, .24, .24, .04]))
            for _ in range(n)]


@pytest.mark.parametrize("k", [33, 45, 55, 64, 65, 96, 97, 127, 128])
def test_encode_wide_matches_host(k):
    from kmtricks_tpu.core import kmer as kops

    rng = np.random.default_rng(k)
    rep = Repartition.from_xxh(NB_PARTS, M)
    table = jnp.asarray(rep.table.astype(np.int32))
    reads = random_reads(rng, 8)
    L = max(len(r) for r in reads)
    batch = np.full((8, L), ord("N"), dtype=np.uint8)
    lengths = np.zeros(8, dtype=np.int32)
    for i, r in enumerate(reads):
        batch[i, :len(r)] = np.frombuffer(r, dtype=np.uint8)
        lengths[i] = len(r)

    keys, parts, valid = encode_batch_wide(
        jnp.asarray(batch), jnp.asarray(lengths), table, k, M)
    keys = [np.asarray(w) for w in keys]
    parts, valid = np.asarray(parts), np.asarray(valid)

    for i, r in enumerate(reads):
        codes, cvalid = kops.encode_ascii(r)
        if len(codes) < k:
            assert not valid[i, :max(0, len(r) - k + 1)].any()
            continue
        wv = kops.window_validity(cvalid, k)
        W = len(codes) - k + 1
        assert (valid[i, :W] == wv).all()
        if not wv.any():
            continue
        from kmtricks_tpu.ops import u64 as U
        fwd = kops.kmers_from_codes(codes, k)
        cano = kops.canonical(fwd, k)            # (W, slots) LE u64
        rows = U.msb_words_to_u64_rows_np([w[i, :W] for w in keys])
        assert (rows[wv] == cano[wv]).all()
        minim = kops.window_minimizers(codes, k, M)
        assert (parts[i, :W][wv] == rep.table[minim[wv]]).all()


@pytest.mark.parametrize("k,mode", [(45, "kmer"), (45, "hash"),
                                    (64, "kmer"), (96, "kmer"),
                                    (96, "hash"), (127, "kmer"),
                                    (128, "kmer")])
def test_count_and_merge_device_wide(k, mode):
    rng = np.random.default_rng(1000 + k)
    rep = Repartition.from_xxh(NB_PARTS, M)
    samples = [random_reads(rng, 20) for _ in range(2)]
    amin = np.array([1, 2], dtype=np.uint32)

    host, dev = [], []
    for s in samples:
        host.append(count_sequences(s, k, M, rep.table, hard_min=1,
                                    mode=mode, window_bits=WINDOW))
        dev.append(count_sample_device(s, k, M, rep.table, hard_min=1,
                                       mode=mode, window_bits=WINDOW))
    for p in range(NB_PARTS):
        for h, d in zip(host, dev):
            hk, hc = h.partitions.get(p, (None, None))
            dk, dc = d.partitions.get(p, (None, None))
            if hk is None:
                assert dk is None or len(dk) == 0
                continue
            assert (np.asarray(dk) == np.asarray(hk)).all()
            assert (np.asarray(dc) == np.asarray(hc)).all()

        import kmtricks_tpu.core.kmer as kops
        slots = kops.slots_for_k(k)
        empty = (np.zeros((0, slots), dtype=np.uint64) if mode == "kmer"
                 else np.zeros(0, dtype=np.uint64))
        hkeys = [host[i].partitions.get(p, (empty, np.zeros(0, np.uint32)))[0]
                 for i in range(2)]
        hcnts = [host[i].partitions.get(p, (empty, np.zeros(0, np.uint32)))[1]
                 for i in range(2)]
        if not any(len(x) for x in hkeys):
            continue
        g = merge_partition(hkeys, hcnts, amin, 1, 1)
        r = merge_partition_device(hkeys, hcnts, amin, 1, 1)
        assert (np.asarray(r.keys) == np.asarray(g.keys)).all()
        assert (r.counts == g.counts).all()
        assert (r.keep == g.keep).all()
        for f in ("non_solid", "rescued", "uniq_wo_rescue", "uniq_w_rescue",
                  "total_wo_rescue", "total_w_rescue"):
            assert (getattr(r.stats, f) == getattr(g.stats, f)).all(), f


def test_pipeline_backends_k45(tmp_path):
    rng = np.random.default_rng(4545)
    lines = []
    for s in range(3):
        p = tmp_path / f"S{s}.fasta"
        with open(p, "w") as f:
            for i, r in enumerate(random_reads(rng, 30, 90, 200)):
                f.write(f">r{i}\n{r.decode()}\n")
        lines.append(f"S{s} : {p}")
    fof = tmp_path / "t.fof"
    fof.write_text("\n".join(lines) + "\n")

    runs = {}
    for backend in ("host", "device", "mesh"):
        runs[backend] = run_pipeline(PipelineOptions(
            fof=str(fof), run_dir=str(tmp_path / backend), kmer_size=45,
            hard_min=1, soft_min="2", share_min=2, mode="kmer:count:bin",
            static_repart=True, nb_partitions=4, backend=backend))
    for p in range(4):
        a = open(runs["host"].get_matrix_path(p, "count", "bin", "kmer",
                                              False), "rb").read()
        for b in ("device", "mesh"):
            c = open(runs[b].get_matrix_path(p, "count", "bin", "kmer",
                                             False), "rb").read()
            assert a == c, f"{b} differs on partition {p}"


def test_pipeline_backends_k96(tmp_path):
    """k = 96 (6-word device keys) agrees across all three backends."""
    rng = np.random.default_rng(9696)
    lines = []
    for s in range(2):
        p = tmp_path / f"S{s}.fasta"
        with open(p, "w") as f:
            for i, r in enumerate(random_reads(rng, 16, 140, 260)):
                f.write(f">r{i}\n{r.decode()}\n")
        lines.append(f"S{s} : {p}")
    fof = tmp_path / "t.fof"
    fof.write_text("\n".join(lines) + "\n")

    runs = {}
    for backend in ("host", "device", "mesh"):
        runs[backend] = run_pipeline(PipelineOptions(
            fof=str(fof), run_dir=str(tmp_path / backend), kmer_size=96,
            hard_min=1, soft_min="1", mode="kmer:count:bin",
            static_repart=True, nb_partitions=4, backend=backend))
    total = 0
    for p in range(4):
        a = open(runs["host"].get_matrix_path(p, "count", "bin", "kmer",
                                              False), "rb").read()
        total += len(a) - 45                     # payload beyond the header
        for b in ("device", "mesh"):
            c = open(runs[b].get_matrix_path(p, "count", "bin", "kmer",
                                             False), "rb").read()
            assert a == c, f"{b} differs on partition {p}"
    assert total > 0
