"""Bit-matrix transpose (vertical BF windows -> horizontal per-sample rows).

Reference: include/kmtricks/bitmatrix.hpp:75-289 — a byte-addressed bit
matrix (bit j of byte b = bit 8b+j, LSB-first) with an SSE2 16x8 blockwise
transpose. Here: a vectorized numpy transpose for the host path and a JAX
version for on-device transposes; both reproduce BitMatrix::transpose
byte-for-byte (including the row padding to multiples of 8).
"""

from __future__ import annotations

import numpy as np


def round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def transpose_bits(rows: np.ndarray, nrows: int | None = None) -> np.ndarray:
    """Transpose a bit matrix given as (N, nbytes) uint8 rows.

    Output: (nbytes*8, ROUND_UP(N, 8)/8) uint8 — bit (i, j) of the input
    becomes bit (j, i) of the output; input rows are zero-padded to a
    multiple of 8 (BitMatrix ctor + transpose semantics).
    """
    n, nb = rows.shape
    n8 = round_up(max(n, nrows or 0), 8)
    bits = np.unpackbits(rows, axis=1, bitorder="little")        # (n, nb*8)
    if n8 != n:
        bits = np.vstack([bits, np.zeros((n8 - n, nb * 8), np.uint8)])
    return np.packbits(bits.T, axis=1, bitorder="little")


def transpose_bits_device(rows, nrows: int | None = None):
    """JAX twin of :func:`transpose_bits` (jnp arrays in/out)."""
    import jax.numpy as jnp

    n, nb = rows.shape
    n8 = round_up(max(n, nrows or 0), 8)
    # unpack LSB-first
    shifts = jnp.arange(8, dtype=jnp.uint8)
    bits = ((rows[:, :, None] >> shifts) & 1).reshape(n, nb * 8)
    if n8 != n:
        bits = jnp.concatenate(
            [bits, jnp.zeros((n8 - n, nb * 8), jnp.uint8)], axis=0)
    t = bits.T.reshape(nb * 8, n8 // 8, 8)
    return (t << shifts).sum(axis=2).astype(jnp.uint8)
