"""Object-oriented wrapper — the reference C++ layer equivalent.

Mirrors the classes in the reference C++ wrapper (reference: C++/x25519.{h,cpp},
C++/ed25519.{h,cpp}): `X25519Private`, `ED25519Private`, `ED25519Public`,
including random key generation via the hardened RNG and the SHA-512 KDF the
C++ wrapper applies to raw DH shared secrets (C++/x25519.cpp:75-95).

Like the reference wrapper's dedicated static blinders
(C++/custom_blinds.h:1-22), this module keeps distinct key-generation and
signing blinding contexts, derived from the package's static blinder.

Host-convenience layer: single keys, python bytes in/out. For throughput use
the batched functional APIs in curve25519_tpu.models directly.
"""

import numpy as np
import jax.numpy as jnp

from curve25519_tpu.models import blinding, ed25519, x25519
from curve25519_tpu.ops.sha512 import Sha512
from curve25519_tpu.utils.rng import get_random_bytes

__all__ = ["X25519Private", "ED25519Private", "ED25519Public"]

_genkey_blind = None
_signature_blind = None


def _blinds():
    """Lazily created dedicated blinders (analogue of edp_genkey_blinding /
    edp_signature_blinding regenerated per build, custom/custom_code.bat:17-19)."""
    global _genkey_blind, _signature_blind
    if _genkey_blind is None:
        _genkey_blind = blinding.blinding_init(b"oo/genkey/" + get_random_bytes(32))
        _signature_blind = blinding.blinding_init(b"oo/sign/" + get_random_bytes(32))
    return _genkey_blind, _signature_blind


def _arr(b: bytes):
    return jnp.asarray(np.frombuffer(b, np.uint8))


def _bytes(a) -> bytes:
    return bytes(np.asarray(a).reshape(-1).tolist())


class X25519Private:
    """DH private key (reference class X25519Private, C++/x25519.h)."""

    def __init__(self, secret: bytes = None):
        self._sk = secret if secret is not None else get_random_bytes(32)

    def get_public_key(self) -> bytes:
        return _bytes(x25519.calculate_public_key(_arr(self._sk)))

    def create_shared_key(self, peer_public_key: bytes, kdf: bool = True) -> bytes:
        raw = _bytes(x25519.create_shared_key(_arr(peer_public_key),
                                              _arr(self._sk)))
        if not kdf:
            return raw
        # the C++ wrapper hashes the raw secret (C++/x25519.cpp:85-94)
        return Sha512().update(raw).final()[:32]


class ED25519Private:
    """Signing key (reference class ED25519Private, C++/ed25519.h)."""

    def __init__(self, secret: bytes = None):
        seed = secret if secret is not None else get_random_bytes(32)
        gb, _ = _blinds()
        pk, priv = ed25519.create_keypair(_arr(seed), blinding=gb)
        self._priv = _bytes(priv)
        self._pk = _bytes(pk)

    def get_public_key(self) -> bytes:
        return self._pk

    def sign(self, message: bytes) -> bytes:
        _, sb = _blinds()
        msg = _arr(message) if message else jnp.zeros((0,), jnp.uint8)
        return _bytes(ed25519.sign(_arr(self._priv), msg, blinding=sb))


class ED25519Public:
    """Verification key (reference class ED25519Public, C++/ed25519.h).
    Caches the q_table precompute across verifies (two-phase API)."""

    def __init__(self, public_key: bytes):
        self._pk = public_key
        self._ctx = ed25519.verify_init(_arr(public_key))

    def get_public_key(self) -> bytes:
        return self._pk

    def verify(self, signature: bytes, message: bytes) -> bool:
        msg = _arr(message) if message else jnp.zeros((0,), jnp.uint8)
        return bool(np.asarray(
            ed25519.verify_check(self._ctx, _arr(signature), msg)))
