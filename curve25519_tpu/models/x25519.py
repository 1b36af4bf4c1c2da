"""X25519 Diffie-Hellman protocol API (batched).

TPU-native equivalent of the reference DH interface
(reference: source/curve25519_dh.c:159-208, include/curve25519_dh.h).
All functions take/return ``[..., 32]`` uint8 tensors and are jit-friendly;
batch axes scale throughput (one call = many DH ops).

Unlike the reference, secret keys are never mutated in place (functional
style): clamping happens internally.
"""

import jax
import jax.numpy as jnp

from curve25519_tpu.config import MONT_BASE_U
from curve25519_tpu.models import montgomery
from curve25519_tpu.ops import codec, fe

__all__ = ["calculate_public_key", "calculate_public_key_fast",
           "create_shared_key"]


from curve25519_tpu.ops.pallas import use_pallas as _use_pallas


def _base_u(shape):
    b = jnp.zeros(tuple(shape) + (32,), dtype=jnp.uint8)
    return b.at[..., 0].set(MONT_BASE_U)


def calculate_public_key(sk, zr=None):
    """pk = clamp(sk) * G via the Montgomery ladder.
    Reference curve25519_dh_CalculatePublicKey (curve25519_dh.c:192-198)."""
    sk = jnp.asarray(sk, dtype=jnp.uint8)
    if _use_pallas(sk.shape[:-1]):
        from curve25519_tpu.ops.pallas import ladder_kernel
        return ladder_kernel.point_multiply_pallas(_base_u(sk.shape[:-1]),
                                                   sk, zr=zr)
    return montgomery.point_multiply(_base_u(sk.shape[:-1]), sk, zr=zr)


def calculate_public_key_fast(sk, zr=None, nfolds=8):
    """pk via the folding-accelerated Edwards base-point multiply and the
    birational map u = (Z+Y)/(Z-Y).
    Reference curve25519_dh_CalculatePublicKey_fast (curve25519_dh.c:162-189).

    nfolds=8 (default) uses the 256-entry folding table (31 doubles + 32
    adds); nfolds=4 the 16-entry one (62 doubles + 63 adds) — the
    reference's smaller-table build option (ecp_4Folds,
    curve25519_utils.c:125-143)."""
    from curve25519_tpu.models import edwards
    from curve25519_tpu.ops import fold
    sk = codec.clamp(jnp.asarray(sk, dtype=jnp.uint8))
    cut = (fold.cut8_bytes if nfolds == 8 else fold.cut4_bytes)(sk)
    if _use_pallas(sk.shape[:-1]):
        from curve25519_tpu.ops.pallas import edwards_kernel
        # enc(u) is packed in-kernel ("u_bytes"): no limb epilogue outside
        return edwards_kernel.base_mult_pallas(cut, zr=zr, mode="u_bytes",
                                               nfolds=nfolds)
    mult = (edwards.base_point_mult if nfolds == 8
            else edwards.base_point_mult_fold4)
    S = mult(cut, zr=zr)
    num = fe.add(S["z"], S["y"])
    den = fe.sub(S["z"], S["y"])
    u = fe.mul(num, fe.inv(den))
    return fe.to_bytes(u)


def create_shared_key(peer_pk, sk, zr=None):
    """shared = clamp(sk) * peer_pk.
    Reference curve25519_dh_CreateSharedKey (curve25519_dh.c:201-208)."""
    sk = jnp.asarray(sk, dtype=jnp.uint8)
    if _use_pallas(sk.shape[:-1]):
        from curve25519_tpu.ops.pallas import ladder_kernel
        return ladder_kernel.point_multiply_pallas(peer_pk, sk, zr=zr)
    return montgomery.point_multiply(peer_pk, sk, zr=zr)
