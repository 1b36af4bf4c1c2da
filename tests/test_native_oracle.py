"""Differential tests: native C++ host core vs python oracle vs TPU path.

Plays the role of the reference's donna differential test and OpenSSL
cross-test (reference: test/curve25519_test.c:143-154, test/openssl_test.c):
three independent implementations must agree bit-exactly.
"""

import hashlib
import os

import numpy as np
import jax.numpy as jnp
import pytest

from curve25519_tpu import refmodel

nb = pytest.importorskip("curve25519_tpu.native.bindings")


def test_native_sha512():
    for n in [0, 1, 111, 112, 128, 1000]:
        m = os.urandom(n)
        assert nb.sha512(m) == hashlib.sha512(m).digest()


def test_native_x25519_vs_oracle():
    for _ in range(8):
        sk, peer = os.urandom(32), os.urandom(32)
        assert nb.x25519(sk, peer) == refmodel.x25519(sk, peer)


def test_native_ed25519_vs_oracle():
    for _ in range(4):
        sk, msg = os.urandom(32), os.urandom(64)
        pk, priv = nb.ed25519_keypair(sk)
        assert (pk, priv) == refmodel.ed_keypair(sk)
        sig = nb.ed25519_sign(priv, msg)
        assert sig == refmodel.ed_sign(priv, msg)
        assert nb.ed25519_verify(sig, pk, msg)
        assert not nb.ed25519_verify(sig, pk, msg + b"x")


def test_native_fast_paths_bit_identical():
    """The folding-8 fast paths (the single-op latency record contenders)
    must be bit-identical to the generic in-library routines AND the python
    oracle, including streaming-SHA parity for the sign hashes."""
    for i in range(4):
        sk, msg = os.urandom(32), os.urandom(7 * i)
        pk, priv = nb.ed25519_keypair(sk)
        assert nb.ed25519_keypair_fast(sk) == (pk, priv)
        assert nb.ed25519_sign_fast(priv, msg) == nb.ed25519_sign(priv, msg)
        assert nb.x25519_base_fast(sk) == nb.x25519_base(sk)
        assert nb.ed25519_sign_fast(priv, msg) == refmodel.ed_sign(priv, msg)


def test_native_sha512_streaming():
    """O(1)-memory streaming context vs hashlib across update splits that
    exercise the tail/fill paths (reference SHA512_Update semantics,
    source/sha512.c:118-157)."""
    pieces = [b"", os.urandom(1), os.urandom(127), os.urandom(128),
              os.urandom(129), os.urandom(10000), os.urandom(3)]
    st = nb.Sha512Stream()
    h = hashlib.sha512()
    for p in pieces:
        st.update(p)
        h.update(p)
    assert st.final() == h.digest()


def test_native_vs_tpu_path():
    from curve25519_tpu.models import x25519 as jx
    sk, peer = os.urandom(32), os.urandom(32)
    a = jnp.asarray(np.frombuffer(sk, np.uint8))
    b = jnp.asarray(np.frombuffer(peer, np.uint8))
    tpu_out = bytes(np.asarray(jx.create_shared_key(b, a)).tolist())
    assert tpu_out == nb.x25519(sk, peer)
