"""Field arithmetic tests: random differential tests against python ints plus
the p-boundary cases exercised by the reference selftest
(test/curve25519_selftest.c)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from curve25519_tpu.config import P, NLIMBS, MASK, int_to_limbs, limbs_to_int
from curve25519_tpu.ops import fe

rng = np.random.default_rng(1234)


def rand_ints(n):
    return [int.from_bytes(rng.bytes(32), "little") % P for _ in range(n)]


EDGE = [0, 1, 2, 19, 38, P - 1, P - 2, P - 19, 2**255 - 1 - P,  # wrapped
        (1 << 255) % P, (1 << 254) % P, P // 2, P // 2 + 1]


def pack(vals):
    return jnp.asarray(np.stack([int_to_limbs(v) for v in vals]))


def unpack_canon(x):
    return [limbs_to_int(r) % P for r in np.asarray(fe.canon(x))]


def assert_weak(x):
    x = np.asarray(x)
    assert (x >= fe.WEAK_MIN).all() and (x <= fe.WEAK_MAX).all()


def test_bound_stress():
    # adversarial chain: alternating sub/mul/add at extreme values must keep
    # limbs signed-weak and track python-int semantics exactly
    vals = [0, 1, P - 1, P - 2, 2**255 - 1 - P, P // 2] + rand_ints(10)
    ref = list(vals)
    x = pack(vals)
    y = pack(list(reversed(vals)))
    refy = list(reversed(ref))
    for step in range(12):
        x2 = fe.sub(x, y)
        y2 = fe.mul(fe.add(x, y), x2)
        x, y = x2, fe.add(y2, y2)
        ref2 = [(a - b) % P for a, b in zip(ref, refy)]
        refy = [(2 * ((a + b) * c)) % P for a, b, c in zip(ref, refy, ref2)]
        ref = ref2
        assert_weak(x)
        assert_weak(y)
    assert unpack_canon(x) == ref
    assert unpack_canon(y) == refy


@pytest.mark.parametrize("op,ref", [
    (fe.add, lambda a, b: (a + b) % P),
    (fe.sub, lambda a, b: (a - b) % P),
    (fe.mul, lambda a, b: (a * b) % P),
])
def test_binary_ops(op, ref):
    a_vals = rand_ints(64) + EDGE
    b_vals = rand_ints(64) + EDGE[::-1]
    a, b = pack(a_vals), pack(b_vals)
    out = jax.jit(op)(a, b)
    assert_weak(out)
    got = unpack_canon(out)
    want = [ref(x, y) for x, y in zip(a_vals, b_vals)]
    assert got == want


def test_sqr_neg():
    vals = rand_ints(32) + EDGE
    x = pack(vals)
    assert unpack_canon(jax.jit(fe.sqr)(x)) == [(v * v) % P for v in vals]
    assert unpack_canon(jax.jit(fe.neg)(x)) == [(-v) % P for v in vals]


def test_mul_small_add():
    vals = rand_ints(16) + EDGE
    ys = rand_ints(16) + EDGE
    x, y = pack(vals), pack(ys)
    out = jax.jit(lambda x, y: fe.mul_small_add(x, 121665, y))(x, y)
    assert_weak(out)
    assert unpack_canon(out) == [(a + 121665 * b) % P for a, b in zip(vals, ys)]


def test_chained_ops_stay_in_bounds():
    # Long chains must never overflow int32 columns; verify against python ints.
    vals = rand_ints(8)
    x = pack(vals)
    ref = list(vals)
    # deterministic chain: x <- x^2 + x, 30 times
    for _ in range(30):
        x = fe.add(fe.sqr(x), x)
        ref = [(v * v + v) % P for v in ref]
        assert_weak(x)
    assert unpack_canon(x) == ref


def test_inverse():
    vals = rand_ints(8) + [1, 2, P - 1]
    x = pack(vals)
    out = jax.jit(fe.inv)(x)
    assert unpack_canon(out) == [pow(v, P - 2, P) for v in vals]
    # x * inv(x) == 1
    assert unpack_canon(fe.mul(x, out)) == [1] * len(vals)


def test_pow2523():
    vals = rand_ints(4) + [2]
    x = pack(vals)
    out = jax.jit(fe.pow2523)(x)
    assert unpack_canon(out) == [pow(v, (P - 5) // 8, P) for v in vals]


def test_sqrt_ratio():
    us, vs = rand_ints(16), rand_ints(16)
    # force half of them to be actual squares
    for i in range(8):
        r = rand_ints(1)[0]
        us[i] = (r * r * vs[i]) % P
    x, ok = jax.jit(fe.sqrt_ratio)(pack(us), pack(vs))
    ok = np.asarray(ok)
    xi = unpack_canon(x)
    for i in range(16):
        is_sq = pow(us[i] * pow(vs[i], P - 2, P) % P, (P - 1) // 2, P) in (0, 1)
        assert bool(ok[i]) == is_sq
        if is_sq:
            assert (xi[i] * xi[i] - us[i] * pow(vs[i], P - 2, P)) % P == 0


def test_bytes_roundtrip():
    vals = rand_ints(32) + EDGE
    x = pack(vals)
    b = jax.jit(fe.to_bytes)(x)
    assert b.shape[-1] == 32 and b.dtype == jnp.uint8
    back = jax.jit(fe.from_bytes)(b)
    assert unpack_canon(back) == [v % P for v in vals]
    # byte encoding matches little-endian python ints
    for i, v in enumerate(vals):
        assert bytes(np.asarray(b)[i].tolist()) == (v % P).to_bytes(32, "little")


def test_eq_is_zero():
    x = pack([0, P, 5, P - 1])  # P wraps to 0 representation-wise? P fits 20 limbs
    z = fe.is_zero(x)
    assert np.asarray(z).tolist() == [True, True, False, False]
    a = pack([5, 7])
    b = pack([5 + P if False else 5, 8])
    assert np.asarray(fe.eq(a, b)).tolist() == [True, False]
