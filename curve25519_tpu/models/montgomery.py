"""Constant-time Montgomery XZ ladder on curve25519 (batched, scan-based).

TPU-native re-design of the reference ladder (reference:
source/curve25519_dh.c:27-157). Differences by design:

- The reference's branchless pointer-pair select (``PP[j]/QP[j]``,
  curve25519_dh.c:86-89) becomes a ``jnp.where`` conditional swap — XLA
  `select` on the key bit, branch-free on TPU.
- The reference scans for the first set key bit; clamped keys always have
  bit 254 set (curve25519_dh.c:117-121), so we run a *fixed* 254-iteration
  `lax.scan` over bits 253..0 after initializing at k=1 — static shape, no
  data-dependent control flow.
- Z-coordinate randomization: the reference sets P.Z = X + zr with the
  build-time random blinder (curve25519_dh.c:123); here `zr` is an explicit
  field-element argument (any nonzero value yields the same projective point).

One ladder step costs 5M + 4S + 1 small-constant multiply, identical to
ecp_Mont + ecp_MontDouble (curve25519_dh.c:57-84).
"""

import jax
import jax.numpy as jnp

from curve25519_tpu.config import A24
from curve25519_tpu.ops import codec, fe

__all__ = ["ladder", "point_multiply"]


def _ladder_step(x2, z2, x3, z3, u, bit):
    """(P, Q) -> (2P, P+Q) with conditional swap by the key bit."""
    swap = bit == 1
    x2, x3 = fe.select(swap, x3, x2), fe.select(swap, x2, x3)
    z2, z3 = fe.select(swap, z3, z2), fe.select(swap, z2, z3)

    a = fe.add(x2, z2)
    aa = fe.sqr(a)
    b = fe.sub(x2, z2)
    bb = fe.sqr(b)
    e = fe.sub(aa, bb)
    c = fe.add(x3, z3)
    d = fe.sub(x3, z3)
    da = fe.mul(d, a)
    cb = fe.mul(c, b)
    x3n = fe.sqr(fe.add(da, cb))
    z3n = fe.mul(u, fe.sqr(fe.sub(da, cb)))
    x2n = fe.mul(aa, bb)
    z2n = fe.mul(e, fe.mul_small_add(aa, A24, e))

    x2o, x3o = fe.select(swap, x3n, x2n), fe.select(swap, x2n, x3n)
    z2o, z3o = fe.select(swap, z3n, z2n), fe.select(swap, z2n, z3n)
    return x2o, z2o, x3o, z3o


def _mont_double(x, z):
    """(X : Z) -> 2*(X : Z), reference ecp_MontDouble (curve25519_dh.c:40-54)."""
    a = fe.add(x, z)
    b = fe.sub(x, z)
    aa = fe.sqr(a)
    bb = fe.sqr(b)
    x2 = fe.mul(aa, bb)
    e = fe.sub(aa, bb)
    z2 = fe.mul(e, fe.mul_small_add(aa, A24, e))
    return x2, z2


def ladder(u, k_bits, zr=None):
    """Scalar-multiply the point with x-coordinate ``u`` ([..., NLIMBS] limbs)
    by a clamped scalar given as bits ([..., 256] int32). Returns the affine
    x-coordinate limbs of k*P.

    Assumes the scalar is clamped (bit 254 set, bits 0..2 and 255 clear)."""
    u = fe.vary_like(u, k_bits[..., :u.shape[-1]])
    if zr is None:
        zr = fe.one(u.shape[:-1])
    zr = fe.vary_like(zr, u)
    # k = 1 state, Z-randomized: P = (u*zr : zr), Q = 2P
    z1 = zr
    x1 = fe.mul(u, zr)
    x2, z2 = _mont_double(x1, z1)
    # (lo, hi) = (1*G', 2*G') where G' = input point
    state = (x1, z1, x2, z2)

    bits_scan = jnp.moveaxis(k_bits[..., :254], -1, 0)[::-1]  # bit 253 .. 0

    def body(st, bit):
        lo_x, lo_z, hi_x, hi_z = st
        return _ladder_step(lo_x, lo_z, hi_x, hi_z, u, bit), None

    (lo_x, lo_z, _, _), _ = jax.lax.scan(body, state, bits_scan)
    return fe.mul(lo_x, fe.inv(lo_z))


def point_multiply(point_bytes, sk_bytes, zr=None, mask_high_bit=True):
    """Q = k*P from 32-byte encodings; returns 32-byte x-coordinate.

    Reference ecp_PointMultiply (curve25519_dh.c:94-157). The secret key is
    clamped internally. Per RFC 7748 the top bit of the input u-coordinate is
    masked (the reference instead reduces the full 256-bit value mod p,
    curve25519_utils.c:43 — the two only differ on non-canonical inputs)."""
    sk = codec.clamp(sk_bytes)
    if mask_high_bit:
        point_bytes = jnp.asarray(point_bytes, jnp.uint8)
        point_bytes = point_bytes.at[..., 31].set(point_bytes[..., 31] & 0x7F)
    u = fe.from_bytes(point_bytes)
    bits = codec.scalar_bits(sk)
    x = ladder(u, bits, zr=zr)
    return fe.to_bytes(x)
