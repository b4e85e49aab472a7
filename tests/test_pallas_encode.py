"""Pallas encode kernel parity (interpret mode on the CPU mesh)."""

import os

import numpy as np
import jax.numpy as jnp
import pytest

from kmtricks_tpu.core.repartition import Repartition
from kmtricks_tpu.ops.encode import encode_batch
from kmtricks_tpu.ops.experiments.pallas_encode import encode_batch_pallas


pytestmark = pytest.mark.skipif(
    not os.environ.get("KMTRICKS_TEST_EXPERIMENTS"),
    reason="retired experiment kernel (NOTES.md); set KMTRICKS_TEST_EXPERIMENTS=1")

@pytest.mark.parametrize("k,m", [(31, 10), (21, 8), (17, 5)])
def test_pallas_encode_parity(k, m):
    rng = np.random.default_rng(0)
    B, L = 16, 256
    batch = rng.choice(np.frombuffer(b"ACGTN", dtype=np.uint8),
                       size=(B, L), p=[.24, .24, .24, .24, .04])
    lengths = rng.integers(k, L + 1, B).astype(np.int32)
    table = jnp.asarray(Repartition.from_xxh(8, m).table.astype(np.int32))

    a = encode_batch(jnp.asarray(batch), jnp.asarray(lengths), table, k, m)
    b = encode_batch_pallas(jnp.asarray(batch), jnp.asarray(lengths), table,
                            k, m, interpret=True)
    va = np.asarray(a[3])
    assert (np.asarray(a[3]) == np.asarray(b[3])).all()
    for i in range(3):
        assert (np.asarray(a[i])[va] == np.asarray(b[i])[va]).all(), i
