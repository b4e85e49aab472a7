"""Pallas run-merge (mesh receiver: ndev sorted runs -> one sorted
array) vs np.sort, and the mesh wiring that uses it."""

import numpy as np
import pytest

from kmtricks_tpu.ops.pallas_sort import (TILE, merge_sorted_runs_u32,
                                          merge_sorted_runs_words)


def _runs(rng, nruns, cap, fill_frac=0.8):
    """Sentinel-tail-padded ascending runs, uneven fill per run."""
    x = np.full((nruns, cap), 0xFFFFFFFF, dtype=np.uint32)
    for i in range(nruns):
        n = int(rng.integers(0, int(cap * fill_frac) + 1))
        x[i, :n] = np.sort(
            rng.integers(0, 1 << 31, n, dtype=np.uint64).astype(np.uint32))
    return x


@pytest.mark.parametrize("nruns,cap", [
    (2, TILE), (4, TILE), (8, TILE),
    (2, TILE + 1000),          # non-pow2 run length: padded internally
    (4, 2 * TILE - 512),
])
def test_merge_runs_matches_sort(nruns, cap):
    rng = np.random.default_rng(nruns * 100 + cap)
    x = _runs(rng, nruns, cap)
    got = np.asarray(merge_sorted_runs_u32(x, interpret=True))
    assert got.shape == (nruns * cap,)
    np.testing.assert_array_equal(got, np.sort(x.reshape(-1))[:nruns * cap])


def test_merge_runs_fallbacks():
    rng = np.random.default_rng(0)
    # sub-TILE runs and non-pow2 run counts fall back to lax.sort
    for nruns, cap in ((4, 100), (3, TILE), (1, TILE)):
        x = _runs(rng, nruns, cap)
        got = np.asarray(merge_sorted_runs_u32(x, interpret=True))
        np.testing.assert_array_equal(
            got, np.sort(x.reshape(-1))[:nruns * cap])


def _word_runs(rng, nruns, cap, nw, fill_frac=0.8):
    """Sentinel-tail-padded ascending multi-word runs (msb-first words;
    word0's top bit clear on valid entries, like the packed layouts)."""
    ws = [np.full((nruns, cap), 0xFFFFFFFF, dtype=np.uint32)
          for _ in range(nw)]
    for i in range(nruns):
        n = int(rng.integers(0, int(cap * fill_frac) + 1))
        cols = [rng.integers(0, 1 << 31, n, dtype=np.uint64)
                .astype(np.uint32)] + \
               [rng.integers(0, 1 << 32, n, dtype=np.uint64)
                .astype(np.uint32) for _ in range(nw - 1)]
        # duplicate some rows to exercise tie handling
        if n > 8:
            src = rng.integers(0, n, n // 4)
            dst = rng.integers(0, n, n // 4)
            for c in cols:
                c[dst] = c[src]
        order = np.lexsort(tuple(reversed(cols)))
        for w in range(nw):
            ws[w][i, :n] = cols[w][order]
    return tuple(ws)


def _lex_sorted(ws):
    """Flat lexicographic sort of a multi-word tuple (numpy oracle)."""
    flat = [w.reshape(-1) for w in ws]
    order = np.lexsort(tuple(reversed(flat)))
    return tuple(f[order] for f in flat)


@pytest.mark.parametrize("nw", [2, 3])
@pytest.mark.parametrize("nruns,cap", [
    (2, TILE), (4, TILE), (2, TILE + 1000),
])
def test_merge_word_runs_matches_lexsort(nw, nruns, cap):
    rng = np.random.default_rng(nw * 1000 + nruns * 10 + cap)
    ws = _word_runs(rng, nruns, cap, nw)
    got = merge_sorted_runs_words(ws, interpret=True)
    want = _lex_sorted(ws)
    for w, (g, e) in enumerate(zip(got, want)):
        np.testing.assert_array_equal(np.asarray(g), e, err_msg=f"word {w}")


def test_merge_word_runs_fallbacks():
    rng = np.random.default_rng(7)
    # sub-TILE runs / non-pow2 run counts fall back to lax.sort; one word
    # dispatches to the single-word path
    for nruns, cap, nw in ((4, 128, 2), (3, TILE, 3), (1, TILE, 2),
                           (4, TILE, 1)):
        ws = _word_runs(rng, nruns, cap, nw)
        got = merge_sorted_runs_words(ws, interpret=True)
        want = _lex_sorted(ws)
        for g, e in zip(got, want):
            np.testing.assert_array_equal(np.asarray(g), e)


def test_one_device_mesh_skips_resort_correctly():
    """sorted_runs == 1 skips the receiver re-sort; a 1-device mesh step
    must still equal the single-chip step on the valid prefix."""
    import jax.numpy as jnp

    from kmtricks_tpu.parallel.pipeline import (build_sharded_pipeline,
                                                build_single_chip_step,
                                                make_mesh)

    rng = np.random.default_rng(9)
    B, L, K, M, NSAMP, NB = 64, 160, 31, 10, 4, 16
    batch = rng.choice(np.frombuffer(b"ACGTN", dtype=np.uint8), size=(B, L))
    lengths = rng.integers(K, L + 1, B).astype(np.int32)
    samp = (np.arange(B, dtype=np.int32) * NSAMP) // B
    args = (jnp.asarray(batch), jnp.asarray(lengths), jnp.asarray(samp),
            jnp.asarray(np.zeros(4 ** M, np.int32)),
            jnp.asarray(np.full(NSAMP, 2, np.uint32)))
    kw = dict(k=K, m=M, nsamp=NSAMP, hard_min=1, rmin=1, save_if=1,
              mode="hash", window_bits=4096)
    cap = B * (L - K + 1)
    mesh_out = build_sharded_pipeline(
        make_mesh(1), nb_parts=NB, cap=cap, static_repart=True, **kw)(*args)
    chip_out = build_single_chip_step(static_repart_parts=NB, **kw)(*args)
    # both are sorted with invalid entries (sentinels) at the tail; the
    # valid prefixes must agree element for element
    m_final, c_final = np.asarray(mesh_out[3]), np.asarray(chip_out[3])
    m_pres, c_pres = (np.asarray(mesh_out[5]).astype(bool),
                      np.asarray(chip_out[5]).astype(bool))
    n = c_pres.sum()
    assert m_pres.sum() == n
    for mi, ci in ((1, 1), (2, 2), (3, 3), (4, 4)):
        mv = mesh_out[mi]
        cv = chip_out[ci]
        if isinstance(mv, tuple):
            for a, b in zip(mv, cv):
                assert np.array_equal(np.asarray(a)[m_pres],
                                      np.asarray(b)[c_pres])
        else:
            assert np.array_equal(np.asarray(mv)[m_pres],
                                  np.asarray(cv)[c_pres])


@pytest.mark.parametrize("layout_case", [
    "h1",    # hash, 1 packed word
    "h2",    # hash, 64-bit window space -> 2 packed words
    "k3",    # kmer k=31 -> 3 packed words
    "kw",    # kmer k=33 -> wide-key packed layout (3 words)
])
def test_mesh_step_with_pallas_routed_merge(monkeypatch, layout_case):
    """Full sharded step with KMTRICKS_TPU_ROUTED_MERGE=pallas (interpret
    mode on CPU) == the lax.sort route, bit for bit — for every packed
    layout family the mesh router produces."""
    import jax.numpy as jnp

    from kmtricks_tpu.parallel.pipeline import (build_sharded_pipeline,
                                                make_mesh)

    rng = np.random.default_rng(3)
    B, L, M, NSAMP, NB = 64, 160, 10, 4, 16
    K = {"h1": 31, "h2": 31, "k3": 31, "kw": 33}[layout_case]
    batch = rng.choice(np.frombuffer(b"ACGTN", dtype=np.uint8),
                       size=(B, L))
    lengths = rng.integers(K, L + 1, B).astype(np.int32)
    samp = (np.arange(B, dtype=np.int32) * NSAMP) // B
    args = (jnp.asarray(batch), jnp.asarray(lengths), jnp.asarray(samp),
            jnp.asarray(np.zeros(4 ** M, np.int32)),
            jnp.asarray(np.full(NSAMP, 2, np.uint32)))
    mesh = make_mesh(8)
    kw = dict(k=K, m=M, nb_parts=NB, cap=TILE, nsamp=NSAMP, hard_min=1,
              rmin=1, save_if=1, static_repart=True)
    if layout_case in ("h1", "h2"):
        # h2: > 31 bits of window space forces the 2-word hash layout
        kw.update(mode="hash",
                  window_bits=4096 if layout_case == "h1" else (1 << 28))
    else:
        kw.update(mode="kmer")

    import jax
    from kmtricks_tpu.ops.count_merge import packed_layout
    from kmtricks_tpu.ops.encode import device_key_words
    nw = 2 if kw["mode"] == "hash" else device_key_words(K)
    key_bits = ((kw["window_bits"] * NB - 1).bit_length()
                if kw["mode"] == "hash" else 2 * K)
    lay = packed_layout(NSAMP, nw, kw["mode"] == "hash", key_bits,
                        (NB - 1).bit_length())
    assert lay is not None and lay.split(".")[0].startswith(
        layout_case[0]) and (layout_case != "kw" or lay.startswith("kw."))

    monkeypatch.setenv("KMTRICKS_TPU_ROUTED_MERGE", "xla")
    ref = build_sharded_pipeline(mesh, **kw)(*args)
    monkeypatch.setenv("KMTRICKS_TPU_ROUTED_MERGE", "pallas")
    got = build_sharded_pipeline(mesh, **kw)(*args)
    for i, (x, y) in enumerate(zip(jax.tree_util.tree_leaves(ref),
                                   jax.tree_util.tree_leaves(got))):
        assert np.array_equal(np.asarray(x), np.asarray(y)), i
