"""Scalar (mod l) arithmetic tests vs python ints, mirroring the reference
selftest's mod-BPO identities (test/curve25519_selftest.c:657-714)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from curve25519_tpu.config import ELL, int_to_limbs, limbs_to_int
from curve25519_tpu.ops import sc

rng = np.random.default_rng(99)


def rand_ints(n, mod=ELL):
    return [int.from_bytes(rng.bytes(33), "little") % mod for _ in range(n)]


EDGE = [0, 1, 2, ELL - 1, ELL - 2, 2**252, ELL // 2, 27742317777372353535851937790883648493]


def pack(vals):
    return jnp.asarray(np.stack([int_to_limbs(v) for v in vals]))


def unpack(x):
    return [limbs_to_int(r) for r in np.asarray(x)]


def test_add_mul():
    a_vals = rand_ints(48) + EDGE
    b_vals = rand_ints(48) + EDGE[::-1]
    a, b = pack(a_vals), pack(b_vals)
    assert unpack(jax.jit(sc.add)(a, b)) == [(x + y) % ELL for x, y in zip(a_vals, b_vals)]
    assert unpack(jax.jit(sc.mul)(a, b)) == [(x * y) % ELL for x, y in zip(a_vals, b_vals)]


def test_muladd():
    a_vals, b_vals, c_vals = rand_ints(16), rand_ints(16), rand_ints(16)
    out = jax.jit(sc.muladd)(pack(a_vals), pack(b_vals), pack(c_vals))
    assert unpack(out) == [(x * y + z) % ELL for x, y, z in zip(a_vals, b_vals, c_vals)]


def test_mod_of_large():
    # values up to 2^260 - 1 (maximum normalized 20-limb value)
    vals = [int.from_bytes(rng.bytes(33), "little") % (2**260) for _ in range(32)]
    vals += [2**260 - 1, ELL, ELL + 1, 2 * ELL, 255 * ELL + 12345]
    x = pack(vals)
    assert unpack(jax.jit(sc.mod)(x)) == [v % ELL for v in vals]


def test_from_digest():
    digs = [rng.bytes(64) for _ in range(24)] + [b"\xff" * 64, b"\x00" * 64]
    md = jnp.asarray(np.stack([np.frombuffer(d, np.uint8) for d in digs]))
    out = jax.jit(sc.from_digest)(md)
    assert unpack(out) == [int.from_bytes(d, "little") % ELL for d in digs]


def test_bytes_roundtrip():
    vals = rand_ints(16) + [0, 1, ELL - 1]
    b = jax.jit(sc.to_bytes)(pack(vals))
    for i, v in enumerate(vals):
        assert bytes(np.asarray(b)[i].tolist()) == v.to_bytes(32, "little")
    assert unpack(jax.jit(sc.from_bytes)(b)) == vals


def test_neg():
    vals = rand_ints(8) + [1, ELL - 1]
    out = unpack(jax.jit(sc.neg)(pack(vals)))
    assert [v % ELL for v in out] == [(-v) % ELL for v in vals]


def test_inv_split_key():
    # split-key identity k1*k2 == 1 mod l (selftest :786-817)
    vals = rand_ints(4) + [1, 2]
    x = pack(vals)
    out = jax.jit(sc.inv)(x)
    assert unpack(out) == [pow(v, ELL - 2, ELL) for v in vals]
    assert unpack(sc.mul(x, out)) == [1] * len(vals)


def test_montgomery_form():
    """Montgomery-form ops vs direct multiplication — the reference's
    I*D-three-ways and 1000-random Montgomery-vs-direct equivalence checks
    (test/curve25519_selftest.c:657-714)."""
    a_vals = rand_ints(32) + EDGE
    b_vals = rand_ints(32) + EDGE[::-1]
    a, b = pack(a_vals), pack(b_vals)

    # to_mont/from_mont round-trip
    assert unpack(sc.from_mont(sc.to_mont(a))) == [v % ELL for v in a_vals]

    # mont_mul(aR, bR) == (a*b)R; from_mont of it == a*b mod l (direct)
    ab_mont = sc.mont_mul(sc.to_mont(a), sc.to_mont(b))
    direct = sc.mul(a, b)
    assert unpack(sc.from_mont(ab_mont)) == unpack(direct)
    assert unpack(ab_mont) == unpack(sc.to_mont(direct))


@pytest.mark.slow
def test_exp_mod_bpo():
    """x^E mod l with runtime little-endian byte exponents (reference
    eco_ExpModBPO): Fermat x^(l-1) = 1, x^1 = x, and inv equivalence
    x^(l-2) == sc.inv(x)."""
    vals = rand_ints(6) + [2, ELL - 1]
    x = pack(vals)
    n = x.shape[0]

    em1 = jnp.broadcast_to(
        jnp.asarray(np.frombuffer((ELL - 1).to_bytes(32, "little"),
                                  np.uint8)), (n, 32))
    assert unpack(sc.exp_mod_bpo(x, em1)) == [1] * n

    one = jnp.broadcast_to(
        jnp.asarray(np.frombuffer((1).to_bytes(32, "little"), np.uint8)),
        (n, 32))
    assert unpack(sc.exp_mod_bpo(x, one)) == [v % ELL for v in vals]

    em2 = jnp.broadcast_to(
        jnp.asarray(np.frombuffer((ELL - 2).to_bytes(32, "little"),
                                  np.uint8)), (n, 32))
    assert unpack(sc.exp_mod_bpo(x, em2)) == unpack(sc.inv(x))
