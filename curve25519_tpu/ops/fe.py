"""fe25519 — field arithmetic mod p = 2^255 - 19 as batched int32 limb tensors.

TPU-native re-design of the reference field core (reference:
source/curve25519_mehdi.c:103-360 for the portable-C version and
source/asm64/amd64.gnu/{Mult,Square,Add,Sub}.s for the assembly version).

Representation: ``[..., NLIMBS]`` int32 tensors, radix 2^13, 20 limbs
(see curve25519_tpu/config.py for the radix rationale). All leading axes are
batch axes; every op is elementwise/vectorized over them, contains no
data-dependent control flow, and therefore is constant-time on TPU by
construction (the analogue of the reference's branchless discipline,
source/curve25519_mehdi.c:185-209).

Invariant ("weakly normalized"): limbs[1:] < 2^13 and limbs[0] <= 2^13 + 608.
Every public op accepts and returns weakly-normalized values, which keeps all
schoolbook column sums < 2^31 (int32-safe). ``canon`` produces the unique
canonical representative (< p, fully normalized) for encoding/comparison.
"""

import jax
import jax.numpy as jnp
import numpy as np

from curve25519_tpu.config import (
    BITS, FOLD, MASK, NLIMBS, P, int_to_limbs,
)

__all__ = [
    "zero", "one", "from_int", "add", "sub", "neg", "mul", "sqr",
    "mul_small_add", "canon", "inv", "pow2523", "is_zero", "eq",
    "select", "to_bytes", "from_bytes", "sqrt_ratio",
]

# Static constant limb vectors -------------------------------------------------
_P_LIMBS = int_to_limbs(P)

# 64*p = 2^261 - 1216 encoded in 20 limbs with an augmented top limb:
# digit0 = 8191-1215, digits 1..18 = 8191, digit19 = 2^14 - 1.
# Adding it before a subtraction keeps every intermediate value non-negative
# (the analogue of the reference's _w_maxP trick, source/curve25519_mehdi.c:119).
_SUB_PAD = np.full(NLIMBS, MASK, dtype=np.int32)
_SUB_PAD[0] = MASK - 1215
_SUB_PAD[19] = (1 << (BITS + 1)) - 1
assert sum(int(v) << (BITS * i) for i, v in enumerate(_SUB_PAD)) == 64 * P


def _const(v):
    return jnp.asarray(v, dtype=jnp.int32)


# ---------------------------------------------------------------------------
# Carry propagation
# ---------------------------------------------------------------------------
def _carry(x, ncols):
    """One signed sequential carry pass over the last axis.

    Returns (digits, carry_out) where digits are in [0, 2^13) and
    ``value(x) == value(digits) + carry_out * 2^(13*ncols)``. Works for
    negative intermediates: ``t >> 13`` is an arithmetic shift (floor div) and
    ``t & MASK`` extracts the matching non-negative digit.
    """
    c = jnp.zeros(x.shape[:-1], dtype=jnp.int32)
    outs = []
    for i in range(ncols):
        t = x[..., i] + c
        outs.append(t & MASK)
        c = t >> BITS
    return jnp.stack(outs, axis=-1), c


def _reduce20(cols):
    """Reduce 20 (possibly large/negative, |digit| < 2^30.5) columns to a
    weakly-normalized element. Two carry passes with 608-folds between them."""
    d, c = _carry(cols, NLIMBS)
    d = d.at[..., 0].add(FOLD * c)
    d, c = _carry(d, NLIMBS)
    return d.at[..., 0].add(FOLD * c)  # c in {0, 1} here


def _reduce_product(cols):
    """Reduce 39 schoolbook columns (each < 2^30.5) to weak-normal form.

    First pass normalizes all 39 columns exactly (the value < 2^520 so the
    final carry-out is bounded by ~2^13); the high 260 bits are folded down
    with 2^260 = 608 (mod p), then _reduce20 finishes.
    """
    d, c = _carry(cols, 2 * NLIMBS - 1)
    high = jnp.concatenate([d[..., NLIMBS:], c[..., None]], axis=-1)
    return _reduce20(d[..., :NLIMBS] + FOLD * high)


# ---------------------------------------------------------------------------
# Basic ops
# ---------------------------------------------------------------------------
def zero(shape=()):
    return jnp.zeros(tuple(shape) + (NLIMBS,), dtype=jnp.int32)


def one(shape=()):
    return from_int(1, shape)


def from_int(v, shape=()):
    x = _const(int_to_limbs(v % P))
    return jnp.broadcast_to(x, tuple(shape) + (NLIMBS,))


def add(x, y):
    """z = x + y (mod p), reference ecp_AddReduce (curve25519_mehdi.c:134)."""
    return _reduce20(x + y)


def sub(x, y):
    """z = x - y (mod p), reference ecp_SubReduce (curve25519_mehdi.c:161)."""
    return _reduce20(x - y + _const(_SUB_PAD))


def neg(y):
    return _reduce20(_const(_SUB_PAD) - y)


def _mul_cols(x, y):
    """Schoolbook product columns: cols[k] = sum_{i+j=k} x_i * y_j.

    Row-accumulation form (the vectorized analogue of the reference's
    ecp_mul_set/ecp_mul_add row ops, curve25519_mehdi.c:91-101)."""
    cols = jnp.zeros(jnp.broadcast_shapes(x.shape[:-1], y.shape[:-1])
                     + (2 * NLIMBS - 1,), dtype=jnp.int32)
    for i in range(NLIMBS):
        cols = cols.at[..., i:i + NLIMBS].add(x[..., i:i + 1] * y)
    return cols


def mul(x, y):
    """z = x * y (mod p), reference ecp_MulReduce (curve25519_mehdi.c:278)."""
    return _reduce_product(_mul_cols(x, y))


def sqr(x):
    """z = x^2 (mod p), reference ecp_SqrReduce (curve25519_mehdi.c:310)."""
    return _reduce_product(_mul_cols(x, x))


def mul_small_add(x, c, y):
    """z = x + c * y (mod p) for a small static constant c (c <= ~2^17).

    Reference ecp_WordMulAddReduce (curve25519_mehdi.c:243), used by the
    Montgomery ladder for the 121665 multiply."""
    return _reduce20(x + c * y)


def select(mask, a, b):
    """Branchless select: a where mask else b. mask shape = batch shape."""
    return jnp.where(mask[..., None], a, b)


# ---------------------------------------------------------------------------
# Canonicalization & comparison
# ---------------------------------------------------------------------------
def canon(x):
    """Full reduction to the canonical representative in [0, p).

    Reference ecp_Mod (curve25519_mehdi.c:185-209): branchless double
    conditional subtract. Here: estimate q = value >> 255 from the top limb,
    subtract q*p (always non-negative), then one conditional subtract of p.
    """
    d, c = _carry(x, NLIMBS)
    d = d.at[..., 0].add(FOLD * c)
    d, _ = _carry(d, NLIMBS)              # value < 2^260, fully normalized
    q = d[..., 19] >> 8                   # bits 255.. of the value (0..31)
    t = d - q[..., None] * _const(_P_LIMBS)
    td, _ = _carry(t, NLIMBS)             # value in [0, 2^255 + 589)
    u = td - _const(_P_LIMBS)
    ud, uc = _carry(u, NLIMBS)            # uc == -1 iff value < p
    return jnp.where((uc == 0)[..., None], ud, td)


def is_zero(x):
    """True where x == 0 (mod p). Batch-shaped bool array."""
    return jnp.all(canon(x) == 0, axis=-1)


def eq(x, y):
    """True where x == y (mod p)."""
    return jnp.all(canon(x) == canon(y), axis=-1)


# ---------------------------------------------------------------------------
# Inversion / exponentiation
# ---------------------------------------------------------------------------
def _pow_const(x, e):
    """x^e for a static exponent via left-to-right square-and-multiply scan.

    The reference uses DJB's 254-squaring addition chain
    (curve25519_mehdi.c:340); on TPU a `lax.scan` over the exponent bits keeps
    the traced graph small while remaining branch-free (the multiply is always
    computed; a `where` selects it in)."""
    nbits = e.bit_length()
    bits = jnp.asarray([(e >> i) & 1 for i in range(nbits - 2, -1, -1)],
                       dtype=jnp.int32)

    def body(t, bit):
        t = sqr(t)
        return select(jnp.full(t.shape[:-1], bit, jnp.int32) == 1,
                      mul(t, x), t), None

    t, _ = jax.lax.scan(body, x, bits)
    return t


def inv(x):
    """x^(p-2) = 1/x (mod p), reference ecp_Inverse (curve25519_mehdi.c:340)."""
    return _pow_const(x, P - 2)


def pow2523(x):
    """x^(2^252 - 3) = x^((p-5)/8), reference ecp_ModExp2523
    (ed25519_verify.c:116-135). Used for square roots in point decompression."""
    return _pow_const(x, (P - 5) // 8)


def sqrt_ratio(u, v):
    """Return (x, ok) with x = sqrt(u/v) when it exists.

    Computes x = u*v^3 * (u*v^7)^((p-5)/8) then applies the sqrt(-1) fixup,
    mirroring ed25519_CalculateX (reference: ed25519_verify.c:66-100) but
    fully branchless/batched. ``ok`` is False where u/v is not a square."""
    from curve25519_tpu.config import SQRT_M1
    v2 = sqr(v)
    v3 = mul(v2, v)
    a = mul(u, v3)                    # u*v^3
    b = mul(a, sqr(v2))               # u*v^7
    x = mul(pow2523(b), a)
    # check x^2 * v == u ?
    chk = sub(mul(sqr(x), v), u)
    good = is_zero(chk)
    x = select(good, x, mul(x, from_int(SQRT_M1)))
    chk2 = sub(mul(sqr(x), v), u)
    return x, jnp.logical_or(good, is_zero(chk2))


# ---------------------------------------------------------------------------
# Byte codec (little-endian 32-byte strings, reference curve25519_utils.c)
# ---------------------------------------------------------------------------
def to_bytes(x):
    """Canonical little-endian 32-byte encoding: [..., 32] uint8.

    Reference ecp_WordsToBytes (curve25519_utils.c:61) composed with a full
    reduction (callers of the reference do ecp_Mod/MulMod first)."""
    d = canon(x)
    shifts = jnp.arange(BITS, dtype=jnp.int32)
    bits = (d[..., :, None] >> shifts) & 1          # [..., 20, 13]
    bits = bits.reshape(bits.shape[:-2] + (NLIMBS * BITS,))[..., :256]
    bytes_ = bits.reshape(bits.shape[:-1] + (32, 8))
    weights = (1 << jnp.arange(8, dtype=jnp.int32))
    return jnp.sum(bytes_ * weights, axis=-1).astype(jnp.uint8)


def from_bytes(b):
    """[..., 32] uint8 little-endian -> limbs (normalized, NOT reduced mod p,
    matching reference ecp_BytesToWords semantics, curve25519_utils.c:43)."""
    b = b.astype(jnp.int32)
    shifts = jnp.arange(8, dtype=jnp.int32)
    bits = (b[..., :, None] >> shifts) & 1          # [..., 32, 8]
    bits = bits.reshape(bits.shape[:-2] + (256,))
    pad = jnp.zeros(bits.shape[:-1] + (NLIMBS * BITS - 256,), jnp.int32)
    bits = jnp.concatenate([bits, pad], axis=-1)
    bits = bits.reshape(bits.shape[:-1] + (NLIMBS, BITS))
    weights = (1 << jnp.arange(BITS, dtype=jnp.int32))
    return jnp.sum(bits * weights, axis=-1).astype(jnp.int32)
