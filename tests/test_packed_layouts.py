"""Packed sort-layout parity: every layout must produce identical
count+merge results (they differ only in how (valid, part, key, sample)
ride the sort operands — semantics per merge.hpp:183-260 are layout-free).
"""

import numpy as np
import pytest

from kmtricks_tpu.ops.count_merge import count_merge_keys, packed_layout


def _random_occurrences(rng, n, nb_parts, key_bits, nsamp):
    part = rng.integers(0, nb_parts, n).astype(np.int32)
    hi_bits = max(key_bits - 32, 0)
    hi = (rng.integers(0, 1 << hi_bits, n, dtype=np.uint64).astype(np.uint32)
          if hi_bits else np.zeros(n, np.uint32))
    lo_width = min(key_bits, 32)
    lo = rng.integers(0, 1 << lo_width, n, dtype=np.uint64).astype(np.uint32)
    samp = rng.integers(0, nsamp, n).astype(np.int32)
    valid = rng.random(n) < 0.9
    return part, (hi, lo), samp, valid


def _run(part, keys, samp, valid, nsamp, part_bits, key_bits):
    amin = np.full(nsamp, 2, dtype=np.uint32)
    return count_merge_keys(
        part, keys, samp, valid, amin, nsamp=nsamp, hard_min=1,
        rmin=1, save_if=1, count_max=255, part_follows_keys=False,
        key_bits=key_bits, part_bits=part_bits)


def _assert_same(a, b):
    (part_a, keys_a, samp_a, fin_a, cnt_a, pres_a, rh_a, rk_a, ro_a,
     st_a) = a
    (part_b, keys_b, samp_b, fin_b, cnt_b, pres_b, rh_b, rk_b, ro_b,
     st_b) = b
    pres_a, pres_b = np.asarray(pres_a), np.asarray(pres_b)
    assert (pres_a == pres_b).all()
    sel = pres_a
    for wa, wb in zip(keys_a, keys_b):
        assert (np.asarray(wa)[sel] == np.asarray(wb)[sel]).all()
    for xa, xb in zip((part_a, samp_a, fin_a, cnt_a, rh_a, rk_a),
                      (part_b, samp_b, fin_b, cnt_b, rh_b, rk_b)):
        assert (np.asarray(xa)[sel] == np.asarray(xb)[sel]).all()
    assert (np.asarray(st_a) == np.asarray(st_b)).all()


@pytest.mark.parametrize("key_bits,nb_parts,nsamp", [
    (40, 16, 3),     # kb > 32: key straddles both words
    (32, 8, 2),      # kb == 32 boundary
    (20, 64, 4),     # kb < 32: key entirely in the low word
    (54, 4, 4),      # near the 64-bit budget: 1 + 2 + 54 + 2 = 59
])
def test_k2_matches_k3(key_bits, nb_parts, nsamp):
    part_bits = (nb_parts - 1).bit_length()
    assert packed_layout(nsamp, 2, False, key_bits, part_bits) == \
        f"k2.{part_bits}.{key_bits}"
    # unknown partition width -> generic multi-operand path (k3's part
    # field is 16 bits, so it needs a known width)
    assert packed_layout(nsamp, 2, False, None, None) is None
    rng = np.random.default_rng(key_bits * 7 + nsamp)
    part, keys, samp, valid = _random_occurrences(
        rng, 4096, nb_parts, key_bits, nsamp)
    k2 = _run(part, keys, samp, valid, nsamp, part_bits, key_bits)
    k3 = _run(part, keys, samp, valid, nsamp, None, None)
    _assert_same(k2, k3)


def test_k2_overflow_falls_back():
    # 1 + pb + kb + sb > 64 must not pick k2
    assert packed_layout(8, 2, False, 62, 6) == "k3"
    # sample bits too wide for k3 and budget too wide for k2 -> the
    # generalized 3-word pack (still beats the 4-operand generic path)
    assert packed_layout(1 << 16, 2, False, 45, 4) == "kw.4.45.2"
    # wide sample counts alone don't disqualify k2
    assert packed_layout(1 << 16, 2, False, 20, 4) == "k2.4.20"
    # partition id wider than k3's 16-bit field -> kw
    assert packed_layout(8, 2, False, 62, 17) == "kw.17.62.2"
    # wide keys of unknown width -> generic
    assert packed_layout(8, 4, False, None, 6) is None


def _random_wide(rng, n, nb_parts, key_bits, nw, nsamp, pool=512):
    # draw keys from a small pool so (key, sample) runs with count > 1
    # actually occur (random wide keys never collide)
    part = rng.integers(0, nb_parts, n).astype(np.int32)
    pick = rng.integers(0, pool, n)
    words = []
    for j in range(nw):          # msb-first; word j holds key bits
        b = key_bits - 32 * (nw - 1 - j)
        if b <= 0:
            words.append(np.zeros(n, np.uint32))
        else:
            vals = rng.integers(0, 1 << min(b, 32), pool, dtype=np.uint64)
            words.append(vals[pick].astype(np.uint32))
    samp = rng.integers(0, nsamp, n).astype(np.int32)
    valid = rng.random(n) < 0.9
    return part, tuple(words), samp, valid


@pytest.mark.parametrize("key_bits,nw,nb_parts,nsamp", [
    (66, 4, 16, 3),      # k=33: 3 packed words vs 6 generic operands
    (94, 4, 64, 8),      # k=47: 4 words
    (128, 4, 4, 4),      # k=64: 5 words
    (192, 6, 16, 2),     # k=96: 7 words
    (254, 8, 8, 5),      # k=127: 9 words
])
def test_kw_matches_generic(key_bits, nw, nb_parts, nsamp):
    """The generalized wide-key pack must reproduce the generic
    multi-operand sort path bit-for-bit (same merge semantics, fewer
    sort operands)."""
    part_bits = (nb_parts - 1).bit_length()
    layout = packed_layout(nsamp, nw, False, key_bits, part_bits)
    assert layout == f"kw.{part_bits}.{key_bits}.{nw}", layout
    rng = np.random.default_rng(key_bits * 5 + nw + nsamp)
    part, keys, samp, valid = _random_wide(
        rng, 4096, nb_parts, key_bits, nw, nsamp)
    kw = _run(part, keys, samp, valid, nsamp, part_bits, key_bits)
    gen = _run(part, keys, samp, valid, nsamp, None, None)
    _assert_same(kw, gen)
