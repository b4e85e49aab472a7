"""Fused encode->hash->pack kernel vs the jnp path, bit for bit."""

import os

import numpy as np
import pytest

from kmtricks_tpu.ops.count_merge import pack_words
from kmtricks_tpu.ops.experiments.pallas_encode_pack import encode_pack_h1_pallas


pytestmark = pytest.mark.skipif(
    not os.environ.get("KMTRICKS_TEST_EXPERIMENTS"),
    reason="retired experiment kernel (NOTES.md); set KMTRICKS_TEST_EXPERIMENTS=1")

def _jnp_words(batch, lengths, samp, k, m, nb_parts, window_bits, nsamp):
    import jax.numpy as jnp

    from kmtricks_tpu.parallel.pipeline import _encode_flat

    keys, sampw, parts, valid = _encode_flat(
        jnp.asarray(np.ascontiguousarray(batch.T)), jnp.asarray(lengths),
        jnp.asarray(samp), jnp.asarray(np.zeros(4 ** m, np.int32)), k, m,
        "hash", window_bits, "auto", nb_parts, "lb")
    (w,) = pack_words("h1", parts, keys, sampw, valid, nsamp)
    return np.asarray(w)


@pytest.mark.parametrize("k,m,nb_parts,window_bits,nsamp", [
    (31, 10, 64, 4096, 8),
    (21, 8, 16, 2048, 4),
    (32, 10, 4, 1024, 2),     # k == 32 boundary (no revcomp realign)
    (17, 5, 8, 65536, 1),
])
def test_fused_pack_matches_jnp(k, m, nb_parts, window_bits, nsamp):
    rng = np.random.default_rng(k * 7 + m)
    B, L = 128, 192
    batch = rng.choice(np.frombuffer(b"ACGTN", dtype=np.uint8), size=(B, L))
    lengths = rng.integers(k, L + 1, B).astype(np.int32)
    samp = (np.arange(B, dtype=np.int32) * nsamp) // B
    sb = max(1, (nsamp - 1).bit_length())

    ref = _jnp_words(batch, lengths, samp, k, m, nb_parts, window_bits,
                     nsamp)
    got = np.asarray(encode_pack_h1_pallas(
        np.ascontiguousarray(batch.T), lengths, samp, k, m, nb_parts,
        window_bits, sb, interpret=True))
    np.testing.assert_array_equal(got, ref)
