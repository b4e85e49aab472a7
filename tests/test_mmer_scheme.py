"""--mmer-scheme: canonical (default — the reference binary's actual
routing AND its fixtures; the NONCANONICAL define is dead by include
order) vs forward (the dead define's intent). Both GATB-executed-
golden-tested at the op level (test_ref_exec_golden); here: e2e wiring."""

import os

import numpy as np
import pytest

from kmtricks_tpu.runtime.pipeline import PipelineOptions, run_pipeline


def _collection(tmp_path, nsamp=2):
    rng = np.random.default_rng(77)
    genome = rng.choice(np.frombuffer(b"ACGT", dtype=np.uint8), size=3000)
    lines = []
    for s in range(nsamp):
        p = tmp_path / f"S{s}.fasta"
        with open(p, "w") as f:
            for r in range(12):
                start = int(rng.integers(0, 2800))
                f.write(f">r{r}\n"
                        f"{genome[start:start + 160].tobytes().decode()}\n")
        lines.append(f"S{s} : {p}")
    fof = tmp_path / "c.fof"
    fof.write_text("\n".join(lines) + "\n")
    return str(fof)


def _artifacts(run_dir):
    out = {}
    for sub in ("matrices", "merge_infos"):
        d = os.path.join(run_dir, sub)
        for f in sorted(os.listdir(d)):
            out[f"{sub}/{f}"] = open(os.path.join(d, f), "rb").read()
    return out


def test_forward_scheme_backends_agree_and_differ_from_canonical(tmp_path):
    fof = _collection(tmp_path)
    runs = {}
    for scheme in ("canonical", "forward"):
        for backend in ("host", "device"):
            rd = tmp_path / f"{scheme}_{backend}"
            run_pipeline(PipelineOptions(
                fof=fof, run_dir=str(rd), kmer_size=25, minim_size=8,
                mode="kmer:count:bin", backend=backend, static_repart=True,
                nb_partitions=8, hard_min=1, soft_min="1",
                mmer_scheme=scheme))
            runs[(scheme, backend)] = _artifacts(str(rd))
    for scheme in ("canonical", "forward"):
        assert runs[(scheme, "host")] == runs[(scheme, "device")], scheme
    # the scheme changes PARTITION ROUTING (per-partition matrix bytes),
    # not the union of counted k-mers
    assert runs[("canonical", "host")] != runs[("forward", "host")]


def test_scheme_persisted_for_module_reruns(tmp_path):
    """config.json carries mmer_scheme, so later MODULE invocations
    (kmtricks superk against the run dir) route by the run's scheme."""
    from kmtricks_tpu.runtime.config import Config
    from kmtricks_tpu.runtime.modules import module_superk

    fof = _collection(tmp_path, nsamp=1)
    skp = {}
    for scheme in ("canonical", "forward"):
        rd = tmp_path / f"run_{scheme}"
        run_pipeline(PipelineOptions(
            fof=fof, run_dir=str(rd), kmer_size=25, minim_size=8,
            mode="kmer:count:bin", backend="host", static_repart=True,
            nb_partitions=8, hard_min=1, soft_min="1", mmer_scheme=scheme,
            until="repart"))
        cfg = Config.load(str(rd / "config"))
        assert cfg.mmer_scheme == scheme
        # the module reads the persisted config — no scheme in its opts
        module_superk(str(rd), "S0", PipelineOptions(verbose="warning"))
        skp[scheme] = {p: (rd / "superkmers" / "S0"
                           / f"skp.{p}").read_bytes() for p in range(8)}
    assert skp["canonical"] != skp["forward"]

    # deterministic re-run from the persisted config
    rd = tmp_path / "run_forward"
    module_superk(str(rd), "S0", PipelineOptions(verbose="warning"))
    again = {p: (rd / "superkmers" / "S0" / f"skp.{p}").read_bytes()
             for p in range(8)}
    assert again == skp["forward"]
