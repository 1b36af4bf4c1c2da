"""Cross-implementation oracle vs OpenSSL (through `cryptography`'s hazmat
bindings), mirroring the reference's openssl_test which asserts byte equality
of keypair / public key / shared key / signature outputs against OpenSSL EVP
(reference: test/openssl_test.c:181-261)."""

import hashlib

import numpy as np
import jax.numpy as jnp
import pytest

cryptography = pytest.importorskip("cryptography")
from cryptography.hazmat.primitives.asymmetric.ed25519 import (  # noqa: E402
    Ed25519PrivateKey, Ed25519PublicKey)
from cryptography.hazmat.primitives.asymmetric.x25519 import (   # noqa: E402
    X25519PrivateKey)

from curve25519_tpu.models import ed25519, x25519                # noqa: E402
from curve25519_tpu.ops.sha512 import sha512                     # noqa: E402

rng = np.random.default_rng(77)


def _arr(b: bytes):
    return jnp.asarray(np.frombuffer(b, np.uint8))


def _bytes(a) -> bytes:
    return bytes(np.asarray(a).reshape(-1).tolist())


def test_x25519_public_key_matches_openssl():
    # batch of random secrets: our base-point mult == OpenSSL's
    # (openssl_test.c asserts pubkey byte equality, :222-227)
    sks = [rng.bytes(32) for _ in range(8)]
    ours = np.asarray(x25519.calculate_public_key(
        jnp.asarray(np.frombuffer(b"".join(sks), np.uint8).reshape(8, 32))))
    for i, sk in enumerate(sks):
        theirs = X25519PrivateKey.from_private_bytes(sk) \
            .public_key().public_bytes_raw()
        assert bytes(ours[i].tolist()) == theirs


def test_x25519_shared_secret_matches_openssl():
    a, b = rng.bytes(32), rng.bytes(32)
    ka = X25519PrivateKey.from_private_bytes(a)
    kb = X25519PrivateKey.from_private_bytes(b)
    openssl_shared = ka.exchange(kb.public_key())
    ours = _bytes(x25519.create_shared_key(
        _arr(kb.public_key().public_bytes_raw()), _arr(a)))
    assert ours == openssl_shared


def test_ed25519_keypair_and_sign_match_openssl():
    for _ in range(4):
        seed, msg = rng.bytes(32), rng.bytes(int(rng.integers(0, 80)))
        k = Ed25519PrivateKey.from_private_bytes(seed)
        pk, priv = ed25519.create_keypair(_arr(seed))
        assert _bytes(pk) == k.public_key().public_bytes_raw()
        m = _arr(msg) if msg else jnp.zeros((0,), jnp.uint8)
        assert _bytes(ed25519.sign(priv, m)) == k.sign(msg)


def test_ed25519_verify_accepts_openssl_signatures_and_vice_versa():
    seed, msg = rng.bytes(32), b"interop message"
    k = Ed25519PrivateKey.from_private_bytes(seed)
    pk_bytes = k.public_key().public_bytes_raw()
    # their signature verifies under our verifier
    ok = ed25519.verify(_arr(k.sign(msg)), _arr(pk_bytes), _arr(msg))
    assert bool(np.asarray(ok))
    # our signature verifies under OpenSSL
    _, priv = ed25519.create_keypair(_arr(seed))
    sig = _bytes(ed25519.sign(priv, _arr(msg)))
    Ed25519PublicKey.from_public_bytes(pk_bytes).verify(sig, msg)  # raises on fail


def test_sha512_matches_hashlib():
    for n in [0, 1, 111, 112, 127, 128, 129, 1000]:
        msg = rng.bytes(n)
        m = _arr(msg) if msg else jnp.zeros((0,), jnp.uint8)
        assert _bytes(sha512(m)) == hashlib.sha512(msg).digest()
