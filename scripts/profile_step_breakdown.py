"""On-chip stage breakdown of the bench headline step (hash k=31, B=8192):
encode+pack only, +sort, full step — to see where the remaining ms live."""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import jax

cache = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     "..", ".jax_cache")
jax.config.update("jax_compilation_cache_dir", os.path.abspath(cache))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

import jax.numpy as jnp

from kmtricks_tpu.core.repartition import Repartition
from kmtricks_tpu.ops import count_merge as cm
from kmtricks_tpu.parallel.pipeline import _encode_flat, build_single_chip_step


def fetch(out):
    return np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[:8])


def rate(step, args, iters=10):
    fetch(step(*args))
    fetch(step(*args))
    t0 = time.perf_counter()
    out = None
    for _ in range(iters):
        out = step(*args)
    fetch(out)
    return (time.perf_counter() - t0) / iters


def main():
    rng = np.random.default_rng(42)
    K, M, NB_PARTS, WINDOW_BITS, NSAMP = 31, 10, 64, 250048, 8
    B, L = 8192, 1024
    G = B * L // 10
    genome = rng.choice(np.frombuffer(b"ACGT", dtype=np.uint8), size=G)
    starts = rng.integers(0, G - L, B)
    batch = genome[starts[:, None] + np.arange(L)]
    repart = Repartition.from_xxh(NB_PARTS, M)
    args = (jnp.asarray(np.ascontiguousarray(batch.T)),
            jnp.asarray(np.full(B, L, np.int32)),
            jnp.asarray((np.arange(B, dtype=np.int32) * NSAMP) // B),
            jnp.asarray(repart.table.astype(np.int32)),
            jnp.asarray(np.full(NSAMP, 2, np.uint32)))
    kps = B * (L - K + 1)
    key_bits = (WINDOW_BITS * NB_PARTS - 1).bit_length()

    def enc(batch, lengths, samp, repart_table, amin_vec):
        return _encode_flat(batch, lengths, samp, repart_table, K, M,
                            "hash", WINDOW_BITS, "auto", NB_PARTS, "lb", True)

    def enc_pack(batch, lengths, samp, repart_table, amin_vec):
        keys, sampw, parts, valid = enc(batch, lengths, samp, repart_table,
                                        amin_vec)
        layout = cm.packed_layout(NSAMP, len(keys), True, key_bits)
        return cm.pack_words(layout, parts, keys, sampw, valid, NSAMP)

    def enc_pack_sort(batch, lengths, samp, repart_table, amin_vec):
        keys, sampw, parts, valid = enc(batch, lengths, samp, repart_table,
                                        amin_vec)
        layout = cm.packed_layout(NSAMP, len(keys), True, key_bits)
        words = cm.pack_words(layout, parts, keys, sampw, valid, NSAMP)
        return cm.sort_packed(layout, words)

    full = build_single_chip_step(
        k=K, m=M, nsamp=NSAMP, hard_min=2, rmin=1, save_if=2,
        mode="hash", window_bits=WINDOW_BITS,
        static_repart_parts=NB_PARTS, with_stats=False, batch_layout="lb")

    for name, fn in (("encode", enc), ("encode+pack", enc_pack),
                     ("encode+pack+sort", enc_pack_sort), ("full", full)):
        dt = rate(jax.jit(fn), args, iters=8)
        print(f"{name:18s}: {dt*1e3:8.2f} ms ({kps/dt/1e6:7.1f} M/s)")


if __name__ == "__main__":
    main()
