"""Object-oriented wrapper — the reference C++ layer equivalent.

Mirrors the classes in the reference C++ wrapper (reference: C++/x25519.{h,cpp},
C++/ed25519.{h,cpp}): `X25519Private`, `ED25519Private`, `ED25519Public`,
including random key generation via the hardened RNG and the SHA-512 KDF the
C++ wrapper applies to raw DH shared secrets (C++/x25519.cpp:75-95).

Like the reference wrapper's dedicated static blinders
(C++/custom_blinds.h:1-22), this module keeps distinct key-generation and
signing blinding contexts, derived from the package's static blinder.

Host-convenience layer: single keys, python bytes in/out. Single-op calls
route through the native C++ host core (curve25519_tpu/native) by default —
a JAX dispatch costs ~3-4 ms through the device tunnel, while the native
path completes in tens of microseconds, beating the reference's single-core
CreateSharedKey (~80 us, reference README.md:123-125). This is the TPU
framework's answer to the reference's single-op latency regime; for
throughput use the batched functional APIs in curve25519_tpu.models.

The two paths are bit-identical: signatures do not depend on blinding (the
reference test asserts the same, test/curve25519_test.c:323-410) and the
differential suite (tests/test_native_oracle.py, tests/test_oo.py) pins
native == JAX outputs. Side-channel note: the native host path computes
without scalar blinding / Z-randomization; construct with ``native=False``
to force the blinded JAX path when that hardening matters more than
latency (the reference offers the same choice via its non-blinded API).
"""

import os

import numpy as np

from curve25519_tpu.utils.rng import get_random_bytes

__all__ = ["X25519Private", "ED25519Private", "ED25519Public"]

_genkey_blind = None
_signature_blind = None

_UNSET = object()
_native_mod = _UNSET


def _native():
    """The native host core's bindings, or None when disabled/unbuildable.
    Gate: CURVE25519_TPU_HOST_NATIVE=0 disables (tests use it to pin the
    JAX path); a failed build (no g++) falls back silently."""
    global _native_mod
    if os.environ.get("CURVE25519_TPU_HOST_NATIVE", "1") == "0":
        return None
    if _native_mod is _UNSET:
        try:
            from curve25519_tpu.native import bindings
            bindings.load()
            _native_mod = bindings
        except Exception:
            _native_mod = None
    return _native_mod


def _blinds():
    """Lazily created dedicated blinders (analogue of edp_genkey_blinding /
    edp_signature_blinding regenerated per build, custom/custom_code.bat:17-19)."""
    global _genkey_blind, _signature_blind
    if _genkey_blind is None:
        from curve25519_tpu.models import blinding
        _genkey_blind = blinding.blinding_init(b"oo/genkey/" + get_random_bytes(32))
        _signature_blind = blinding.blinding_init(b"oo/sign/" + get_random_bytes(32))
    return _genkey_blind, _signature_blind


def _arr(b: bytes):
    import jax.numpy as jnp
    return jnp.asarray(np.frombuffer(b, np.uint8))


def _bytes(a) -> bytes:
    return bytes(np.asarray(a).reshape(-1).tolist())


def _kdf(raw: bytes) -> bytes:
    """SHA-512 KDF over the raw DH secret (C++/x25519.cpp:85-94)."""
    nb = _native()
    if nb is not None:
        return nb.sha512(raw)[:32]
    from curve25519_tpu.ops.sha512 import Sha512
    return Sha512().update(raw).final()[:32]


class X25519Private:
    """DH private key (reference class X25519Private, C++/x25519.h).

    native=None (default) routes single-op calls through the C++ host core
    when available; False forces the JAX path (with Z-randomization)."""

    def __init__(self, secret: bytes = None, native: bool = None):
        self._sk = secret if secret is not None else get_random_bytes(32)
        self._native = native

    def _nb(self):
        return _native() if self._native in (None, True) else None

    def get_public_key(self) -> bytes:
        nb = self._nb()
        if nb is not None:
            # folding fast path (the reference's CalculatePublicKey_fast
            # regime); bit-identical to the ladder route
            return nb.x25519_base_fast(self._sk)
        from curve25519_tpu.models import x25519
        return _bytes(x25519.calculate_public_key(_arr(self._sk)))

    def create_shared_key(self, peer_public_key: bytes, kdf: bool = True) -> bytes:
        nb = self._nb()
        if nb is not None:
            raw = nb.x25519(self._sk, peer_public_key)
        else:
            from curve25519_tpu.models import x25519
            raw = _bytes(x25519.create_shared_key(_arr(peer_public_key),
                                                  _arr(self._sk)))
        if not kdf:
            return raw
        # the C++ wrapper hashes the raw secret (C++/x25519.cpp:85-94)
        return _kdf(raw)


class ED25519Private:
    """Signing key (reference class ED25519Private, C++/ed25519.h).

    native=None (default): single-op keygen/sign on the C++ host core
    (unblinded — identical signatures, microsecond latency); False: the
    blinded JAX path with the dedicated genkey/sign blinders."""

    def __init__(self, secret: bytes = None, native: bool = None):
        seed = secret if secret is not None else get_random_bytes(32)
        self._native = native
        nb = self._nb()
        if nb is not None:
            pk, priv = nb.ed25519_keypair_fast(seed)
            self._pk, self._priv = pk, priv
            return
        from curve25519_tpu.models import ed25519
        gb, _ = _blinds()
        pk, priv = ed25519.create_keypair(_arr(seed), blinding=gb)
        self._priv = _bytes(priv)
        self._pk = _bytes(pk)

    def _nb(self):
        return _native() if self._native in (None, True) else None

    def get_public_key(self) -> bytes:
        return self._pk

    def sign(self, message: bytes) -> bytes:
        nb = self._nb()
        if nb is not None:
            return nb.ed25519_sign_fast(self._priv, message)
        import jax.numpy as jnp
        from curve25519_tpu.models import ed25519
        _, sb = _blinds()
        msg = _arr(message) if message else jnp.zeros((0,), jnp.uint8)
        return _bytes(ed25519.sign(_arr(self._priv), msg, blinding=sb))


class ED25519Public:
    """Verification key (reference class ED25519Public, C++/ed25519.h).
    Single verifies route through the native host core; the q_table
    precompute (two-phase API) is built lazily on first JAX-path verify and
    then cached across verifies, like the reference's EDP_SIGV_CTX."""

    def __init__(self, public_key: bytes, native: bool = None):
        self._pk = public_key
        self._native = native
        self._ctx = None

    def _nb(self):
        return _native() if self._native in (None, True) else None

    def get_public_key(self) -> bytes:
        return self._pk

    def verify(self, signature: bytes, message: bytes) -> bool:
        nb = self._nb()
        if nb is not None:
            return nb.ed25519_verify(signature, self._pk, message)
        import jax.numpy as jnp
        from curve25519_tpu.models import ed25519
        if self._ctx is None:
            self._ctx = ed25519.verify_init(_arr(self._pk))
        msg = _arr(message) if message else jnp.zeros((0,), jnp.uint8)
        return bool(np.asarray(
            ed25519.verify_check(self._ctx, _arr(signature), msg)))
