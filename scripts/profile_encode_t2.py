"""Does the (L, B) encode win survive an on-device transpose of the
(B, L) input? And does the u8 vs u32 transpose placement matter?"""
import os
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import jax

cache = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     "..", ".jax_cache")
jax.config.update("jax_compilation_cache_dir", os.path.abspath(cache))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

import jax.numpy as jnp

from profile_encode_t import encode_batch_T, rate
from kmtricks_tpu.ops.encode import encode_batch

U32 = jnp.uint32


@partial(jax.jit, static_argnames=("k", "m", "static_parts"))
def encode_T_from_BL(batch, lengths, k, m, static_parts):
    return encode_batch_T(batch.T, lengths, k, m, static_parts)


def main():
    rng = np.random.default_rng(0)
    K, M, NB_PARTS, L, B = 31, 10, 64, 1024, 4096
    G = B * L // 10
    genome = rng.choice(np.frombuffer(b"ACGT", dtype=np.uint8), size=G)
    starts = rng.integers(0, G - L, B)
    batch = genome[starts[:, None] + np.arange(L)]
    lengths = np.full(B, L, dtype=np.int32)
    jb = jnp.asarray(batch)
    jbT = jnp.asarray(np.ascontiguousarray(batch.T))
    jl = jnp.asarray(lengths)
    table = jnp.zeros(4**M, jnp.int32)

    ej = jax.jit(partial(encode_batch, k=K, m=M, static_parts=NB_PARTS))
    dt = rate(ej, (jb, jl, table))
    print(f"encode (B,L):              {dt*1e3:8.2f} ms")

    eT = partial(encode_batch_T, k=K, m=M, static_parts=NB_PARTS)
    dt = rate(eT, (jbT, jl))
    print(f"encode (L,B) pre-T:        {dt*1e3:8.2f} ms")

    eTd = partial(encode_T_from_BL, k=K, m=M, static_parts=NB_PARTS)
    dt = rate(eTd, (jb, jl))
    print(f"encode (L,B) device-T:     {dt*1e3:8.2f} ms")


if __name__ == "__main__":
    main()
