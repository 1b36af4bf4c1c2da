"""FOLDING digit extraction — the reference's signature trick, as bit
permutations on TPU.

The reference extracts interleaved bit-slices of the 256-bit scalar with
shift/rotate loops (reference: ecp_8Folds / ecp_4Folds,
source/curve25519_utils.c:125-153 and asm64/amd64.gnu/Fold.s:32-94). On TPU a
fold is a pure bit-permutation: reshape the scalar's bit tensor and contract
with power-of-two weights — one vectorized op per batch, no loops.

Bit conventions (verified against the reference C):
- 8-fold: cut[c] (c = 0..31) has bit j = scalar bit 32*j + (31 - c); cut[0]
  holds the most-significant slice.
- 4-fold: v[c] (c = 0..31) takes bits from odd 32-bit words 1,3,5,7 at
  position 31-c (bit m of v[c] = scalar bit 32*(2m+1) + 31 - c);
  v[32 + c] from even words 0,2,4,6.
"""

import jax.numpy as jnp

__all__ = ["cut8", "cut4"]


def cut8(bits):
    """bits: [..., 256] -> [..., 32] int32 digits in [0, 256)."""
    b = bits.reshape(bits.shape[:-1] + (8, 32))       # [..., word j, bit k]
    rev = b[..., ::-1]                                # bit index 31-c at col c
    w = (1 << jnp.arange(8, dtype=jnp.int32))
    return jnp.einsum("...jc,j->...c", rev, w).astype(jnp.int32)


def cut4(bits):
    """bits: [..., 256] -> [..., 64] int32 digits in [0, 16).

    First 32 digits come from odd words (consumed first by the verify loop,
    reference edp_PolyPointMultiply, ed25519_verify.c:264-275), last 32 from
    even words."""
    b = bits.reshape(bits.shape[:-1] + (8, 32))
    rev = b[..., ::-1]
    w = (1 << jnp.arange(4, dtype=jnp.int32))
    a = jnp.einsum("...jc,j->...c", rev[..., 1::2, :], w)
    c = jnp.einsum("...jc,j->...c", rev[..., 0::2, :], w)
    return jnp.concatenate([a, c], axis=-1).astype(jnp.int32)
