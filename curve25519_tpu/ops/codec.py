"""Key/point byte codecs and scalar bit utilities (batched).

TPU-native equivalents of the reference's L3 utils layer
(reference: source/curve25519_utils.c). Everything operates on
``[..., 32]`` uint8 tensors with arbitrary batch axes.
"""

import jax.numpy as jnp

__all__ = ["clamp", "scalar_bits", "pack_point", "unpack_parity"]


def clamp(sk):
    """Clamp a secret scalar: sk[0] &= 0xf8; sk[31] = (sk[31]|0x40) & 0x7f.
    Reference ecp_TrimSecretKey (curve25519_utils.c:28-32)."""
    sk = jnp.asarray(sk, dtype=jnp.uint8)
    sk = sk.at[..., 0].set(sk[..., 0] & 0xF8)
    sk = sk.at[..., 31].set((sk[..., 31] | 0x40) & 0x7F)
    return sk


def scalar_bits(sk):
    """[..., 32] uint8 -> [..., 256] int32 little-endian bit expansion."""
    sk = jnp.asarray(sk, dtype=jnp.int32)
    shifts = jnp.arange(8, dtype=jnp.int32)
    bits = (sk[..., :, None] >> shifts) & 1
    return bits.reshape(bits.shape[:-2] + (256,))


def pack_point(y_bytes, x_parity):
    """Ed25519 point compression: y with the x-parity bit in bit 255.
    Reference ed25519_PackPoint / ecp_EncodeInt (curve25519_utils.c:77-98)."""
    hi = (y_bytes[..., 31] & 0x7F) | (x_parity.astype(jnp.uint8) << 7)
    return y_bytes.at[..., 31].set(hi)


def unpack_parity(p_bytes):
    """Split a compressed point into (y_bytes_with_cleared_top_bit, parity).
    Reference ecp_DecodeInt (curve25519_utils.c:100-123)."""
    parity = (p_bytes[..., 31] >> 7) & 1
    y = p_bytes.at[..., 31].set(p_bytes[..., 31] & 0x7F)
    return y, parity.astype(jnp.int32)
