"""Twisted-Edwards point arithmetic in extended homogeneous coordinates,
batched over limb tensors.

Curve: -x^2 + y^2 = 1 + d x^2 y^2 over GF(2^255-19) (a = -1).
Formulas follow eprint 2008/522 with the reference's operand forms
(reference: edp_DoublePoint / edp_AddPoint / edp_AddAffinePoint /
edp_AddBasePoint, source/ed25519_sign.c:66-276, source/ed25519_verify.c:142-161):

- Ext point:  dict(x, y, z, t)            with T = X*Y/Z
- PE point:   dict(ypx, ymx, t2d, z2)     = (Y+X, Y-X, 2d*T, 2Z)
- PA point:   dict(ypx, ymx, t2d)         affine (Z = 1)

The 8-fold base-point multiply is a 31-step `lax.scan` of
(double + constant-time table add) — the TPU version of edp_BasePointMult
(ed25519_sign.c:215-244), with the same randomized projective start.
"""

import jax
import jax.numpy as jnp

from curve25519_tpu.config import ED_DI, NLIMBS
from curve25519_tpu.ops import fe
from curve25519_tpu.models import tables

__all__ = [
    "double", "add_pe", "add_pa", "to_pe", "to_affine", "base_point_mult",
    "base_point_mult_fold4", "identity_ext",
]


def identity_ext(shape=()):
    return {"x": fe.zero(shape), "y": fe.one(shape),
            "z": fe.one(shape), "t": fe.zero(shape)}


def double(p):
    """P = 2*P (4M + 4S), reference edp_DoublePoint (ed25519_sign.c:122-143)."""
    a = fe.sqr(p["x"])
    b = fe.sqr(p["y"])
    c = fe.sqr(p["z"])
    c = fe.add(c, c)
    d = fe.neg(a)                       # D = -A
    h = fe.sub(d, b)                    # H = D - B = -(A+B)
    g = fe.add(d, b)                    # G = D + B = B - A
    f = fe.sub(g, c)                    # F = G - C
    e = fe.sqr(fe.add(p["x"], p["y"]))
    e = fe.add(e, h)                    # E = (X+Y)^2 - A - B
    return {"x": fe.mul(e, f), "y": fe.mul(h, g),
            "z": fe.mul(g, f), "t": fe.mul(e, h)}


def add_pe(p, q):
    """P + Q for Q in PE form (8M), reference edp_AddPoint
    (ed25519_verify.c:142-161)."""
    a = fe.mul(fe.sub(p["y"], p["x"]), q["ymx"])
    b = fe.mul(fe.add(p["y"], p["x"]), q["ypx"])
    c = fe.mul(p["t"], q["t2d"])
    d = fe.mul(p["z"], q["z2"])
    e = fe.sub(b, a)                    # E = B - A
    h = fe.add(b, a)                    # H = B + A
    f = fe.sub(d, c)                    # F = D - C
    g = fe.add(d, c)                    # G = D + C
    return {"x": fe.mul(e, f), "y": fe.mul(h, g),
            "z": fe.mul(g, f), "t": fe.mul(e, h)}


def add_pa(p, q):
    """P + Q for affine precomputed Q (7M), reference edp_AddAffinePoint
    (ed25519_sign.c:97-115)."""
    a = fe.mul(fe.sub(p["y"], p["x"]), q["ymx"])
    b = fe.mul(fe.add(p["y"], p["x"]), q["ypx"])
    c = fe.mul(p["t"], q["t2d"])
    d = fe.add(p["z"], p["z"])          # D = 2*Z1 (Z2 = 1)
    e = fe.sub(b, a)
    h = fe.add(b, a)
    f = fe.sub(d, c)
    g = fe.add(d, c)
    return {"x": fe.mul(e, f), "y": fe.mul(h, g),
            "z": fe.mul(g, f), "t": fe.mul(e, h)}


def to_pe(p):
    """Ext -> PE form, reference edp_ExtPoint2PE (ed25519_sign.c:270-276)."""
    from curve25519_tpu.config import ED_2D
    return {"ypx": fe.add(p["y"], p["x"]),
            "ymx": fe.sub(p["y"], p["x"]),
            "t2d": fe.mul(p["t"], fe.from_int(ED_2D)),
            "z2": fe.add(p["z"], p["z"])}


def to_affine(p):
    """Normalize to affine (x, y) limb tensors (one inverse)."""
    zi = fe.inv(p["z"])
    return fe.mul(p["x"], zi), fe.mul(p["y"], zi)


def _base_mult_folded(cut, zr, gather_fn):
    """Shared folded base-point multiply over precomputed fold digits: seed
    the accumulator from digit 0 with the randomized projective start
    (2xR : 2yR : 2R : 2xyR), then scan (double + constant-time table add)
    over the remaining digits. Parameterized by the gather so the 8-fold and
    4-fold variants share one body (a bound or invariant fix applies to
    both). Digits come from fold.cut8_*/cut4_* — extracted straight from the
    scalar's byte/limb encoding, no bit-tensor intermediate."""
    if zr is None:
        zr = fe.one(cut.shape[:-1])

    p0 = gather_fn(cut[..., 0])
    zr = fe.vary_like(zr, p0["ypx"])
    x = fe.sub(p0["ypx"], p0["ymx"])            # 2x
    y = fe.add(p0["ypx"], p0["ymx"])            # 2y
    t = fe.mul(p0["t2d"], fe.from_int(ED_DI))   # 2xy
    s = {"x": fe.mul(x, zr), "y": fe.mul(y, zr),
         "z": fe.add(zr, zr), "t": fe.mul(t, zr)}

    cut_scan = jnp.moveaxis(cut[..., 1:], -1, 0)  # [ndigits-1, ...]

    def body(st, ci):
        st = double(st)
        st = add_pa(st, gather_fn(ci))
        return st, None

    s, _ = jax.lax.scan(body, s, cut_scan)
    return s


def base_point_mult(cut, zr=None):
    """S = a*G via FOLDING-8: 31 x (double + constant-time table add).

    cut: [..., 32] 8-fold digits (fold.cut8_bytes / cut8_limbs of the
    scalar). zr: optional random field element for the randomized projective
    start, reference edp_BasePointMult (ed25519_sign.c:215-244). Returns an
    Ext point."""
    return _base_mult_folded(cut, zr, tables.gather_pa)


def base_point_mult_fold4(cut, zr=None):
    """S = a*G via FOLDING-4: 63 x (double + constant-time table add) against
    the 16-entry folding4 table — the reference's smaller-table variant
    (ecp_4Folds, curve25519_utils.c:125-143; table generator
    test/curve25519_selftest.c:455-497). Same semantics as base_point_mult
    over [..., 64] 4-fold digits (fold.cut4_*); trades 16x less table memory
    for 2x the loop length."""
    return _base_mult_folded(cut, zr, tables.gather_pa4)
