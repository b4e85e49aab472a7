"""Transposed batch layout ("lb": (L, B), sequence along sublanes) must
produce bit-identical results to the row layout ("bl": (B, L)) — the
occurrence order differs pre-sort but every output rides the sort."""

import numpy as np
import pytest

from kmtricks_tpu.parallel.pipeline import (build_sharded_pipeline,
                                            build_single_chip_step,
                                            make_mesh)


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(7)
    B, L = 64, 160
    genome = rng.choice(np.frombuffer(b"ACGTN", dtype=np.uint8),
                        size=B * L // 4)
    starts = rng.integers(0, len(genome) - L, B)
    batch = genome[starts[:, None] + np.arange(L)]
    lengths = rng.integers(32, L + 1, B).astype(np.int32)
    return batch, lengths


def _args(batch, lengths, nsamp, m):
    import jax.numpy as jnp
    B = lengths.shape[0]
    samp = (np.arange(B, dtype=np.int32) * nsamp) // B
    return (jnp.asarray(batch), jnp.asarray(lengths), jnp.asarray(samp),
            jnp.asarray(np.zeros(4 ** m, np.int32)),
            jnp.asarray(np.full(nsamp, 2, np.uint32)))


def _assert_trees_equal(a, b):
    import jax
    for i, (x, y) in enumerate(zip(jax.tree_util.tree_leaves(a),
                                   jax.tree_util.tree_leaves(b))):
        assert np.array_equal(np.asarray(x), np.asarray(y)), i


@pytest.mark.parametrize("mode,k", [("hash", 31), ("kmer", 31),
                                    ("kmer", 21), ("kmer", 47),
                                    ("hash", 47), ("kmer", 101)])
def test_single_chip_lb_equals_bl(data, mode, k):
    batch, lengths = data
    kw = dict(k=k, m=10, nsamp=4, hard_min=1, rmin=1, save_if=1, mode=mode,
              window_bits=4096 if mode == "hash" else None,
              static_repart_parts=16)
    a = build_single_chip_step(**kw)(*_args(batch, lengths, 4, 10))
    bt = np.ascontiguousarray(batch.T)
    b = build_single_chip_step(batch_layout="lb", **kw)(
        *_args(bt, lengths, 4, 10))
    _assert_trees_equal(a, b)


@pytest.mark.parametrize("mode,k", [("hash", 31), ("kmer", 31),
                                    ("kmer", 21)])   # k=21: k2 layout
def test_mesh_lb_equals_bl(data, mode, k):
    batch, lengths = data
    mesh = make_mesh(8)
    kw = dict(k=k, m=10, nb_parts=16, cap=batch.size, nsamp=4, hard_min=1,
              rmin=1, save_if=1, mode=mode,
              window_bits=4096 if mode == "hash" else None,
              static_repart=True)
    a = build_sharded_pipeline(mesh, **kw)(*_args(batch, lengths, 4, 10))
    bt = np.ascontiguousarray(batch.T)
    b = build_sharded_pipeline(mesh, batch_layout="lb", **kw)(
        *_args(bt, lengths, 4, 10))
    _assert_trees_equal(a, b)
