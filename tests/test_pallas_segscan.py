"""Pallas fused segment-stage kernels vs a direct numpy reference.

Runs in interpret mode on CPU (the TPU path compiles the same kernels).
The numpy reference implements the definitions of
ops/count_merge._segment_stage literally."""

import numpy as np
import pytest

from kmtricks_tpu.ops.pallas_segscan import TILE, segment_stage_pallas


def ref_segment_stage(occ_diff, key_diff, valid, amin_of, hard_min, rmin,
                      save_if, count_max):
    n = len(occ_diff)
    occ_head = occ_diff & valid
    key_head = key_diff & valid
    mark = occ_diff | ~valid
    nxt = np.full(n, n, dtype=np.int64)
    nb = n
    for i in range(n - 1, -1, -1):
        nxt[i] = nb
        if mark[i]:
            nb = i
    cnt_raw = np.where(occ_head, nxt - np.arange(n), 0)
    present = occ_head & (cnt_raw >= hard_min)
    cnt = np.minimum(cnt_raw, count_max)
    solid = present & (cnt >= amin_of)
    # per-key segment totals of solid
    seg = np.cumsum(key_diff) - 1
    solid_in = np.zeros(n, dtype=np.int64)
    for s in np.unique(seg):
        m = seg == s
        solid_in[m] = solid[m].sum()
    rescued = (present & ~solid & (solid_in >= save_if)) if save_if > 0 \
        else np.zeros(n, dtype=bool)
    final = np.where(solid | rescued, cnt, 0)
    row_head = np.zeros(n, dtype=bool)
    for s in np.unique(seg):
        idx = np.where((seg == s) & present)[0]
        if len(idx):
            row_head[idx[0]] = True
    row_keep = row_head & (solid_in >= rmin)
    row_of = np.maximum(np.cumsum(row_head) - 1, 0)
    return cnt, present, solid, final, row_head, row_keep, row_of


def make_case(rng, n, nsamp=4, invalid_tail=200):
    """Random sorted-like segment structure: keys with random run counts."""
    key_diff = np.zeros(n, dtype=bool)
    key_diff[0] = True
    key_diff[1:] = rng.random(n - 1) < 0.3
    occ_diff = key_diff | (rng.random(n) < 0.5)
    occ_diff[0] = True
    valid = np.ones(n, dtype=bool)
    if invalid_tail:
        valid[n - invalid_tail:] = False
    amin_of = rng.integers(1, 4, n)
    return occ_diff, key_diff, valid, amin_of


@pytest.mark.parametrize("n", [TILE // 2, TILE, TILE + 3, 3 * TILE + 1111])
@pytest.mark.parametrize("params", [(1, 1, 0, 0xFFFFFFFF),
                                    (2, 2, 3, 255)])
def test_segscan_matches_reference(n, params):
    hard_min, rmin, save_if, count_max = params
    rng = np.random.default_rng(n + hard_min)
    occ_diff, key_diff, valid, amin_of = make_case(
        rng, n, invalid_tail=min(200, n // 4))
    exp = ref_segment_stage(occ_diff, key_diff, valid, amin_of,
                            hard_min, rmin, save_if, count_max)
    got = segment_stage_pallas(
        occ_diff, key_diff, valid, amin_of, np.full(n, hard_min),
        rmin=rmin, save_if=save_if, count_max=count_max, interpret=True)
    names = ("cnt", "present", "solid", "final", "row_head", "row_keep",
             "row_of")
    for name, g, e in zip(names, got, exp):
        g = np.asarray(g)
        if name == "row_of":
            # only meaningful at/after the first row head
            first = np.argmax(exp[4]) if exp[4].any() else len(g)
            assert (g[first:] == e[first:]).all(), name
        else:
            assert (g.astype(np.int64) == e.astype(np.int64)).all(), name


def test_segscan_long_runs_cross_tiles():
    """A single key run spanning several tiles (carry correctness)."""
    n = 3 * TILE
    occ_diff = np.zeros(n, dtype=bool)
    occ_diff[0] = True
    key_diff = occ_diff.copy()
    valid = np.ones(n, dtype=bool)
    amin_of = np.full(n, 2)
    exp = ref_segment_stage(occ_diff, key_diff, valid, amin_of, 1, 1, 0,
                            0xFFFFFFFF)
    got = segment_stage_pallas(occ_diff, key_diff, valid, amin_of,
                               np.ones(n), rmin=1, save_if=0,
                               count_max=0xFFFFFFFF, interpret=True)
    for g, e in zip(got, exp):
        assert (np.asarray(g).astype(np.int64) == e.astype(np.int64)).all()


def test_segscan_alternating_and_all_invalid():
    n = TILE + 77
    occ_diff = np.ones(n, dtype=bool)          # every entry its own run
    key_diff = np.ones(n, dtype=bool)
    valid = np.zeros(n, dtype=bool)            # all invalid
    amin_of = np.ones(n)
    got = segment_stage_pallas(occ_diff, key_diff, valid, amin_of,
                               np.ones(n), rmin=1, save_if=0,
                               count_max=255, interpret=True)
    assert not np.asarray(got[1]).any()        # nothing present
    assert not np.asarray(got[4]).any()        # no rows


def test_segscan_per_position_hard_min():
    """Per-sample hard-min thresholds as a per-position vector."""
    n = TILE
    rng = np.random.default_rng(3)
    occ_diff, key_diff, valid, amin_of = make_case(rng, n, invalid_tail=64)
    hmin = rng.integers(1, 4, n)
    exp_lo = ref_segment_stage(occ_diff, key_diff, valid, amin_of,
                               1, 1, 0, 255)
    got = segment_stage_pallas(occ_diff, key_diff, valid, amin_of, hmin,
                               rmin=1, save_if=0, count_max=255,
                               interpret=True)
    # positions where hmin == 1 must match the hard_min=1 reference
    sel = (hmin == 1)
    assert (np.asarray(got[1])[sel] == exp_lo[1][sel]).all()
    # with hmin > count, nothing is present
    got_hi = segment_stage_pallas(occ_diff, key_diff, valid, amin_of,
                                  np.full(n, 10**6), rmin=1, save_if=0,
                                  count_max=255, interpret=True)
    assert not np.asarray(got_hi[1]).any()
