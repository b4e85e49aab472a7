"""Worker for the two-process multihost test (run via subprocess).

Usage: python multihost_worker.py <pid> <nproc> <port> <outdir>

Each process contributes 4 forced CPU devices to a global 8-device mesh
(jax.distributed over localhost + gloo collectives — the DCN analogue),
feeds its process-local shard of the global read batch, runs ONE fused
sharded pipeline step, and saves its addressable output shards.
"""
import os
import sys

pid, nproc, port, outdir = (int(sys.argv[1]), int(sys.argv[2]),
                            sys.argv[3], sys.argv[4])
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"

import jax

jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(f"localhost:{port}", nproc, pid)

import numpy as np
import jax.numpy as jnp

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))
from kmtricks_tpu.parallel import multihost as mh
from kmtricks_tpu.parallel.pipeline import build_sharded_pipeline

assert jax.device_count() == 4 * nproc, jax.devices()
K, M, NB, NSAMP, B, L = 31, 10, 16, 4, 64, 160

rng = np.random.default_rng(11)     # same on every process
genome = rng.choice(np.frombuffer(b"ACGTN", dtype=np.uint8), size=B * L // 4)
starts = rng.integers(0, len(genome) - L, B)
batch = genome[starts[:, None] + np.arange(L)]
lengths = rng.integers(K, L + 1, B).astype(np.int32)
samp = (np.arange(B, dtype=np.int32) * NSAMP) // B
amin = np.full(NSAMP, 2, np.uint32)
table = np.zeros(4 ** M, np.int32)

mesh = mh.global_mesh()
lo, hi = mh.host_shard_bounds(B, mesh)
gb = mh.make_global_batch(batch[lo:hi], mesh)
gl = mh.make_global_batch(lengths[lo:hi], mesh)
gs = mh.make_global_batch(samp[lo:hi], mesh)
gt = mh.replicated(table, mesh)
ga = mh.replicated(amin, mesh)

step = build_sharded_pipeline(
    mesh, k=K, m=M, nb_parts=NB, cap=B * (L - K + 1), nsamp=NSAMP,
    hard_min=1, rmin=1, save_if=1, mode="kmer", static_repart=True)
out = step(gb, gl, gs, gt, ga)
jax.block_until_ready(out)

shards = {}
for name, arr in zip(
        ("part", "k0", "k1", "samp", "final", "cnt", "present", "head",
         "keep"),
        (out[0], out[1][0], out[1][1], out[2], out[3], out[4], out[5],
         out[6], out[7])):
    for sh in arr.addressable_shards:
        shards[f"{name}_{sh.index[0].start}"] = np.asarray(sh.data)
shards["stats"] = np.asarray(out[8])
shards["dropped"] = np.asarray(out[9])
np.savez(os.path.join(outdir, f"proc{pid}.npz"), **shards)
print("proc", pid, "done", flush=True)
