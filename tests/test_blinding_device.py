"""On-device Blinding_Init: bit-equality against the host-python oracle
(models/blinding.blinding_init), chaining, jit-compatibility, and signature
invariance (reference ed25519_Blinding_Init, ed25519_sign.c:289-331;
blinding must never change signatures, test/curve25519_test.c:323-410)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from curve25519_tpu.models import blinding, ed25519

SEED = b"round-2 device blinding test seed"


def _assert_ctx_equal(dev, host):
    assert np.array_equal(np.asarray(dev["bl"]), np.asarray(host["bl"]))
    assert np.array_equal(np.asarray(dev["zr"]), np.asarray(host["zr"]))
    assert np.array_equal(np.asarray(dev["zr_bytes"]),
                          np.asarray(host["zr_bytes"]))
    for k in ("ypx", "ymx", "t2d", "z2"):
        assert np.array_equal(np.asarray(dev["bp"][k]),
                              np.asarray(host["bp"][k])), k


def test_device_matches_host_oracle():
    host = blinding.blinding_init(SEED)
    dev = blinding.blinding_init_device(SEED)
    _assert_ctx_equal(dev, host)


def test_device_chaining_matches_host():
    host1 = blinding.blinding_init(SEED)
    host2 = blinding.blinding_init(b"child", parent=host1)
    dev1 = blinding.blinding_init_device(SEED)
    dev2 = blinding.blinding_init_device(b"child", parent=dev1)
    _assert_ctx_equal(dev2, host2)


def test_device_init_under_jit():
    parent = blinding.static_blinding()
    fn = jax.jit(lambda s: blinding.blinding_init_device(s, parent=parent))
    seed = jnp.asarray(np.frombuffer(SEED, np.uint8))
    dev = fn(seed)
    _assert_ctx_equal(dev, blinding.blinding_init(SEED))


def test_fresh_zr_per_lane_and_invariant():
    """fresh_zr gives distinct per-lane randomizers (unlike default_zr's
    shared constant) and must not change any protocol output."""
    from curve25519_tpu.models import x25519
    rng = np.random.default_rng(11)
    B = 8
    key = jax.random.key(42)
    zr = blinding.fresh_zr(key, (B,))
    z = np.asarray(zr)
    assert len({tuple(r) for r in z}) == B          # all lanes distinct
    assert z.shape == (B, 20) and (z != 0).any(axis=-1).all()
    zr2 = blinding.fresh_zr(jax.random.key(43), (B,))
    assert not np.array_equal(np.asarray(zr2), z)   # fresh per key

    sk = jnp.asarray(rng.integers(0, 256, (B, 32), np.uint8))
    base = np.asarray(x25519.calculate_public_key_fast(sk))
    with_zr = np.asarray(x25519.calculate_public_key_fast(sk, zr=zr))
    assert np.array_equal(base, with_zr)
    lad = np.asarray(x25519.calculate_public_key(sk, zr=zr))
    assert np.array_equal(base, lad)


def test_fold4_public_api_matches_fold8():
    from curve25519_tpu.models import x25519
    rng = np.random.default_rng(12)
    sk = jnp.asarray(rng.integers(0, 256, (6, 32), np.uint8))
    a = np.asarray(x25519.calculate_public_key_fast(sk))
    b = np.asarray(x25519.calculate_public_key_fast(sk, nfolds=4))
    assert np.array_equal(a, b)


@pytest.mark.slow
def test_device_blinding_does_not_change_signatures():
    rng = np.random.default_rng(5)
    B = 4
    seeds = jnp.asarray(rng.integers(0, 256, (B, 32), np.uint8))
    msg = jnp.asarray(rng.integers(0, 256, (B, 48), np.uint8))
    pk, priv = ed25519.create_keypair(seeds)
    plain = np.asarray(ed25519.sign(priv, msg))
    ctx = blinding.blinding_init_device(SEED)
    bctx = blinding.as_batch(ctx, (B,))
    blind = np.asarray(ed25519.sign(priv, msg, blinding=bctx))
    assert np.array_equal(plain, blind)
    assert np.asarray(ed25519.verify(jnp.asarray(blind), pk, msg)).all()
