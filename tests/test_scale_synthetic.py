"""10-sample synthetic collection (BASELINE config-2 shape): host vs device
vs mesh backends agree byte-for-byte, rescue semantics exercised at scale."""

import numpy as np
import pytest

from kmtricks_tpu.io import formats as F
from kmtricks_tpu.runtime.pipeline import PipelineOptions, run_pipeline

NSAMP = 10


@pytest.fixture(scope="module")
def synthetic(tmp_path_factory):
    root = tmp_path_factory.mktemp("synth")
    rng = np.random.default_rng(99)
    # shared genome so samples overlap (rescue has something to do)
    genome = rng.choice(np.frombuffer(b"ACGT", dtype=np.uint8), size=20_000)
    lines = []
    for s in range(NSAMP):
        path = root / f"S{s}.fasta"
        with open(path, "w") as f:
            for r in range(120):
                start = int(rng.integers(0, len(genome) - 150))
                read = bytes(genome[start:start + 150]).decode()
                if rng.random() < 0.3:   # private mutations per sample
                    pos = int(rng.integers(0, 150))
                    read = read[:pos] + "ACGT"[int(rng.integers(4))] \
                        + read[pos + 1:]
                f.write(f">r{r}\n{read}\n")
        lines.append(f"S{s} : {path}")
    fof = root / "synth.fof"
    fof.write_text("\n".join(lines) + "\n")
    return str(fof), root


@pytest.mark.parametrize("mode,opts_extra", [
    ("kmer:count:bin", dict(hard_min=2, soft_min="3", share_min=3,
                            recurrence_min=2)),
    ("hash:bf:bin", dict(hard_min=1, soft_min="2", share_min=4,
                         bloom_size=2_000_000)),
])
def test_backends_agree_at_scale(synthetic, tmp_path, mode, opts_extra):
    fof, _root = synthetic
    runs = {}
    for backend in ("host", "device", "mesh"):
        o = PipelineOptions(fof=fof, run_dir=str(tmp_path / backend),
                            kmer_size=31, mode=mode, backend=backend,
                            static_repart=True, nb_partitions=8,
                            **opts_extra)
        runs[backend] = run_pipeline(o)
    cf, m, _ = mode.split(":")
    host = runs["host"]
    nrows = 0
    for p in range(8):
        a = open(host.get_matrix_path(p, m, "bin", cf, False), "rb").read()
        for backend in ("device", "mesh"):
            b = open(runs[backend].get_matrix_path(p, m, "bin", cf, False),
                     "rb").read()
            assert a == b, f"{backend} differs on partition {p} ({mode})"
        ha = open(host.get_merge_info_path(p)).read()
        for backend in ("device", "mesh"):
            assert ha == open(
                runs[backend].get_merge_info_path(p)).read(), backend
        if m == "count":
            _, kk, cc = F.read_matrix_file(
                host.get_matrix_path(p, m, "bin", cf, False))
            nrows += len(kk)
            # rescue visible: some rows carry sub-soft-min counts > 0
            assert cc.shape[1] == NSAMP
    if m == "count":
        assert nrows > 300
