"""X25519 tests: RFC 7748 vectors + Alice/Bob round-trip (the reference's
dh_test, test/curve25519_test.c:429-475) + ladder invariance under Z blinding."""

import numpy as np
import jax
import jax.numpy as jnp

from curve25519_tpu.config import int_to_limbs
from curve25519_tpu.models import x25519
from curve25519_tpu.models.montgomery import point_multiply

rng = np.random.default_rng(5)


def b2a(hexstr):
    return jnp.asarray(np.frombuffer(bytes.fromhex(hexstr), np.uint8))


def a2hex(a):
    return bytes(np.asarray(a).reshape(-1).tolist()).hex()


# RFC 7748 §5.2 test vectors
V1_K = "a546e36bf0527c9d3b16154b82465edd62144c0ac1fc5a18506a2244ba449ac4"
V1_U = "e6db6867583030db3594c1a424b15f7c726624ec26b3353b10a903a6d0ab1c4c"
V1_OUT = "c3da55379de9c6908e94ea4df28d084f32eccf03491c71f754b4075577a28552"
V2_K = "4b66e9d4d1b4673c5ad22691957d6af5c11b6421e0ea01d42ca4169e7918ba0d"
V2_U = "e5210f12786811d3f4b7959d0538ae2c31dbe7106fc03c3efc4cd549c715a493"
V2_OUT = "95cbde9476e8907d7aade45cb4b873f88b595a68799fa152e6f8f7647aac7957"

# RFC 7748 §6.1 Diffie-Hellman vectors
A_SK = "77076d0a7318a57d3c16c17251b26645df4c2f87ebc0992ab177fba51db92c2a"
A_PK = "8520f0098930a754748b7ddcb43ef75a0dbf3a0d26381af4eba4a98eaa9b4e6a"
B_SK = "5dab087e624a8a4b79e17f8b83800ee66f3bb1292618b6fd1c2f8b27ff88e0eb"
B_PK = "de9edb7d7b7dc1b4d35b61c2ece435373f8343c85b78674dadfc7e146f882b4f"
SHARED = "4a5d9d5ba4ce2de1728e3bf480350f25e07e21c947d19e3376f09b3c1e161742"


def test_rfc7748_vectors_batched():
    u = jnp.stack([b2a(V1_U), b2a(V2_U)])
    k = jnp.stack([b2a(V1_K), b2a(V2_K)])
    out = jax.jit(point_multiply)(u, k)
    assert a2hex(out[0]) == V1_OUT
    assert a2hex(out[1]) == V2_OUT


def test_rfc7748_iterated_once():
    k = u = b2a("09" + "00" * 31)
    out = point_multiply(u, k)
    assert a2hex(out) == "422c8e7a6227d7bca1350b3e2bb7279f7897b87bb6854b783c60e80311ae3079"


def test_dh_round_trip_rfc_keys():
    a_pk = x25519.calculate_public_key(b2a(A_SK))
    b_pk = x25519.calculate_public_key(b2a(B_SK))
    assert a2hex(a_pk) == A_PK
    assert a2hex(b_pk) == B_PK
    s1 = x25519.create_shared_key(b_pk, b2a(A_SK))
    s2 = x25519.create_shared_key(a_pk, b2a(B_SK))
    assert a2hex(s1) == SHARED
    assert a2hex(s2) == SHARED


def test_dh_round_trip_random_batch():
    B = 8
    a_sk = jnp.asarray(rng.integers(0, 256, (B, 32), dtype=np.uint8))
    b_sk = jnp.asarray(rng.integers(0, 256, (B, 32), dtype=np.uint8))
    a_pk = jax.jit(x25519.calculate_public_key)(a_sk)
    b_pk = jax.jit(x25519.calculate_public_key)(b_sk)
    s1 = jax.jit(x25519.create_shared_key)(b_pk, a_sk)
    s2 = jax.jit(x25519.create_shared_key)(a_pk, b_sk)
    assert np.array_equal(np.asarray(s1), np.asarray(s2))


def test_z_randomization_invariance():
    # any nonzero zr must produce identical results (projective blinding),
    # mirroring the reference's randomized starting point (curve25519_dh.c:123)
    sk = jnp.asarray(rng.integers(0, 256, (4, 32), dtype=np.uint8))
    base = x25519.calculate_public_key(sk)
    zr_int = int.from_bytes(rng.bytes(31), "little")
    zr = jnp.broadcast_to(jnp.asarray(int_to_limbs(zr_int)), (4, 20))
    blinded = x25519.calculate_public_key(sk, zr=zr)
    assert np.array_equal(np.asarray(base), np.asarray(blinded))
