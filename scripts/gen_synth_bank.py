"""Generate a synthetic multi-sample FASTA bank for end-to-end benchmarks.

Reads are sampled from one shared genome (realistic cross-sample k-mer
overlap and duplicate structure) with per-sample SNPs so samples differ.
"""

import os
import sys

import numpy as np


def gen_bank(outdir: str, nsamp: int = 10, genome: int = 1_000_000,
             coverage: float = 8.0, read_len: int = 1024,
             seed: int = 42) -> str:
    """Write <outdir>/S<i>.fasta + bank.fof; returns the fof path."""
    rng = np.random.default_rng(seed)
    os.makedirs(outdir, exist_ok=True)
    g = rng.choice(np.frombuffer(b"ACGT", dtype=np.uint8), size=genome)
    nreads = int(genome * coverage / read_len)
    lines = []
    for s in range(nsamp):
        gs = g.copy()
        # ~0.1% SNPs per sample
        snps = rng.integers(0, genome, genome // 1000)
        gs[snps] = np.frombuffer(b"ACGT", dtype=np.uint8)[
            rng.integers(0, 4, len(snps))]
        starts = rng.integers(0, genome - read_len, nreads)
        rows = gs[starts[:, None] + np.arange(read_len)]
        path = os.path.join(outdir, f"S{s}.fasta")
        with open(path, "wb") as f:
            hdr = [f">r{i}\n".encode() for i in range(nreads)]
            nl = np.full((nreads, 1), ord("\n"), np.uint8)
            body = np.hstack([rows, nl])
            for i in range(nreads):
                f.write(hdr[i])
                f.write(body[i].tobytes())
        lines.append(f"S{s} : {path}")
    fof = os.path.join(outdir, "bank.fof")
    with open(fof, "w") as f:
        f.write("\n".join(lines) + "\n")
    return fof


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/synth_bank"
    fof = gen_bank(out,
                   nsamp=int(os.environ.get("NSAMP", "10")),
                   genome=int(os.environ.get("GENOME", "1000000")),
                   coverage=float(os.environ.get("COV", "8")),
                   read_len=int(os.environ.get("RLEN", "1024")))
    print(fof)
