"""Many-sample streaming collection (BASELINE config-5 shape, scaled
down): 200 samples through the streaming chunked mesh path with a tiny
chunk budget, byte-equal to the host backend. Exercises the nsamp > 16
code paths (segment_sum per-sample reductions, vector threshold gathers,
wide sample-id bits in the packed sort layouts)."""

import numpy as np

from kmtricks_tpu.runtime.pipeline import PipelineOptions, run_pipeline

NSAMP = 200


def _build_fof(root):
    rng = np.random.default_rng(321)
    genome = rng.choice(np.frombuffer(b"ACGT", dtype=np.uint8), size=4000)
    lines = []
    for s in range(NSAMP):
        p = root / f"S{s:03d}.fasta"
        with open(p, "w") as f:
            for r in range(3):
                start = int(rng.integers(0, len(genome) - 90))
                f.write(f">r{r}\n"
                        f"{bytes(genome[start:start + 90]).decode()}\n")
        lines.append(f"S{s:03d} : {p}")
    fof = root / "big.fof"
    fof.write_text("\n".join(lines) + "\n")
    return str(fof)


def test_200_sample_streaming_equals_host(tmp_path):
    from kmtricks_tpu.runtime.device_pipeline import stage_mesh_chunked
    from kmtricks_tpu.runtime.pipeline import (
        resolve_soft_min, stage_config, stage_repart)

    fof = _build_fof(tmp_path)
    kw = dict(fof=fof, kmer_size=31, hard_min=1, soft_min="2", share_min=3,
              recurrence_min=2, mode="kmer:count:bin", static_repart=True,
              nb_partitions=8)
    host = run_pipeline(PipelineOptions(run_dir=str(tmp_path / "host"),
                                        backend="host", **kw))

    opts = PipelineOptions(run_dir=str(tmp_path / "stream"), **kw)
    kmdir, config = stage_config(opts)
    repart = stage_repart(kmdir, config, opts)
    amin = resolve_soft_min(opts.soft_min, kmdir, NSAMP)
    stage_mesh_chunked(kmdir, config, opts, repart, amin,
                       chunk_windows=8000, use_stream=True)

    for p in range(8):
        a = open(host.get_matrix_path(p, "count", "bin", "kmer", False),
                 "rb").read()
        b = open(kmdir.get_matrix_path(p, "count", "bin", "kmer", False),
                 "rb").read()
        assert a == b, f"partition {p} differs"


def test_1000_sample_streaming_equals_host(tmp_path):
    """BASELINE config-5 sample count (1000 samples, tiny reads): the
    streaming chunked mesh path stays byte-equal to host at full fof
    scale (sample-id bit-width 10, wide threshold vectors)."""
    from kmtricks_tpu.runtime.device_pipeline import stage_mesh_chunked
    from kmtricks_tpu.runtime.pipeline import (
        resolve_soft_min, stage_config, stage_repart)

    rng = np.random.default_rng(55)
    genome = rng.choice(np.frombuffer(b"ACGT", dtype=np.uint8), size=6000)
    lines = []
    for s in range(1000):
        p = tmp_path / f"S{s:04d}.fasta"
        with open(p, "w") as f:
            for r in range(2):
                start = int(rng.integers(0, len(genome) - 100))
                f.write(f">r{r}\n"
                        f"{bytes(genome[start:start + 100]).decode()}\n")
        lines.append(f"S{s:04d} : {p}")
    fof = tmp_path / "f.fof"
    fof.write_text("\n".join(lines) + "\n")
    kw = dict(fof=str(fof), kmer_size=31, hard_min=1, soft_min="2",
              share_min=3, recurrence_min=2, mode="kmer:count:bin",
              static_repart=True, nb_partitions=8)
    host = run_pipeline(PipelineOptions(run_dir=str(tmp_path / "h"),
                                        backend="host", **kw))
    opts = PipelineOptions(run_dir=str(tmp_path / "s"), **kw)
    kmdir, config = stage_config(opts)
    rep = stage_repart(kmdir, config, opts)
    amin = resolve_soft_min(opts.soft_min, kmdir, 1000)
    stage_mesh_chunked(kmdir, config, opts, rep, amin,
                       chunk_windows=20000, use_stream=True)
    for p in range(8):
        a = open(host.get_matrix_path(p, "count", "bin", "kmer", False),
                 "rb").read()
        b = open(kmdir.get_matrix_path(p, "count", "bin", "kmer", False),
                 "rb").read()
        assert a == b, p
