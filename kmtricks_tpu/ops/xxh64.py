"""XXH64 on device, over (hi, lo) uint32-pair words.

Bit-exact replica of XXH64(words, 8*S, seed) for S words (S static), matching
the reference counting hash (gatb/sorting_count.hpp:347-363) and the numpy
golden model (core/hashers.py). Pure jnp vector ops — runs inside jit,
shard_map and Pallas kernels alike.
"""

from __future__ import annotations

import jax.numpy as jnp

from kmtricks_tpu.constants import (
    XXH_PRIME64_1 as P1,
    XXH_PRIME64_2 as P2,
    XXH_PRIME64_3 as P3,
    XXH_PRIME64_4 as P4,
    XXH_PRIME64_5 as P5,
)
from kmtricks_tpu.ops import u64 as U


def _round(acc, inp):
    acc = U.add64(acc, U.mul64_const(inp, P2))
    acc = U.rotl64(acc, 31)
    return U.mul64_const(acc, P1)


def _merge_round(h, v):
    zero = (jnp.zeros_like(v[0]), jnp.zeros_like(v[1]))
    h = U.xor64(h, _round(zero, v))
    return U.add64(U.mul64_const(h, P1), U.const64(P4))


def _avalanche(h):
    h = U.xor64(h, U.shr64(h, 33))
    h = U.mul64_const(h, P2)
    h = U.xor64(h, U.shr64(h, 29))
    h = U.mul64_const(h, P3)
    h = U.xor64(h, U.shr64(h, 32))
    return h


def xxh64(words: list, seed: int = 0):
    """XXH64 over S uint64 words given as a list of (hi, lo) uint32 pairs.

    ``words[i]`` is word i (little-endian order in the byte stream). Returns
    an (hi, lo) pair. S is static (1..8 supported, covering k <= 256).
    """
    s = len(words)
    total_len = 8 * s
    shape = words[0][0].shape
    dtype = words[0][0].dtype

    def bc(c):  # broadcast a 64-bit constant
        hi, lo = U.const64(c)
        return (jnp.full(shape, hi, dtype), jnp.full(shape, lo, dtype))

    i = 0
    if total_len >= 32:
        v1 = bc((seed + P1 + P2) & 0xFFFFFFFFFFFFFFFF)
        v2 = bc((seed + P2) & 0xFFFFFFFFFFFFFFFF)
        v3 = bc(seed & 0xFFFFFFFFFFFFFFFF)
        v4 = bc((seed - P1) & 0xFFFFFFFFFFFFFFFF)
        while i + 4 <= s:
            v1 = _round(v1, words[i])
            v2 = _round(v2, words[i + 1])
            v3 = _round(v3, words[i + 2])
            v4 = _round(v4, words[i + 3])
            i += 4
        h = U.add64(U.add64(U.rotl64(v1, 1), U.rotl64(v2, 7)),
                    U.add64(U.rotl64(v3, 12), U.rotl64(v4, 18)))
        h = _merge_round(h, v1)
        h = _merge_round(h, v2)
        h = _merge_round(h, v3)
        h = _merge_round(h, v4)
    else:
        h = bc((seed + P5) & 0xFFFFFFFFFFFFFFFF)

    h = U.add64(h, bc(total_len))

    zero = bc(0)
    while i < s:
        h = U.xor64(h, _round(zero, words[i]))
        h = U.add64(U.mul64_const(U.rotl64(h, 27), P1), U.const64(P4))
        i += 1

    return _avalanche(h)


def xxh64_u32(values, seed: int = 0):
    """XXH64 of a single little-endian u32 (4-byte input) per lane —
    the static repartition hash (repartition.hpp:45-56 via xxh64_u32).
    Returns an (hi, lo) pair."""
    shape = values.shape
    dtype = jnp.uint32

    def bc(c):
        hi, lo = U.const64(c)
        return (jnp.full(shape, hi, dtype), jnp.full(shape, lo, dtype))

    h = U.add64(bc((seed + P5) & 0xFFFFFFFFFFFFFFFF), bc(4))
    # 4-byte tail: h ^= input * PRIME64_1; h = rotl(h, 23) * P2 + P3
    inp = (jnp.zeros_like(values), values.astype(dtype))
    h = U.xor64(h, U.mul64_const(inp, P1))
    h = U.add64(U.mul64_const(U.rotl64(h, 23), P2), U.const64(P3))
    return _avalanche(h)


def static_partitions(minim, nb_parts: int):
    """partition = XXH64(minimizer u32) % nb_parts on device — bit-identical
    to Repartition.from_xxh's table, with no table gather."""
    h = xxh64_u32(minim.astype(jnp.uint32))
    return U.mod_const(h, nb_parts)[1].astype(jnp.int32)


def window_hash(words: list, partitions, window_bits: int):
    """The counting hash on device: XXH64(kmer) % window + window * partition.

    ``partitions`` is an int32/uint32 array; window_bits is host-known.
    Returns an (hi, lo) pair.
    """
    h = xxh64(words)
    r = U.mod_const(h, window_bits)
    # window * partition as 64-bit: partition < 2^16, window < 2^63
    whi, wlo = U.const64(window_bits)
    p = partitions.astype(jnp.uint32)
    base = U.mul64((jnp.zeros_like(p), p), U.const64(window_bits))
    return U.add64(r, base)
