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

Carry propagation is *parallel*, not sequential: one step masks every limb
and adds the shifted carry vector (5 XLA ops total for all limbs — on a CPU
this would be a loop; on the TPU VPU it is one vector op per term). Limbs
between ops obey the

    SIGNED-WEAK INVARIANT:  -1217 <= limb[i] <= WEAK_MAX = 9500  for every i,

i.e. |limb| <= 9500, which keeps every 20x20 schoolbook column sum bounded
by 20 * 9500^2 < 2^31 (int32-safe; masks/arithmetic shifts are floor-exact
for signed int32, so every carry step is value-preserving for signed
digits). The wrap-around carry out of limb 19 folds back into limb 0 with
2^260 = 608 (mod p) — the lazy-reduction analogue of the reference's
2^256 = 38 trick (source/curve25519_mehdi.c:278-330). Allowing the small
negative underhang buys add/sub/neg a SINGLE wrap carry round (two were
needed when outputs had to be non-negative). Exact bound analysis, with
inputs in [-1217, 9500] (mechanically verified by tests/test_bounds.py,
which propagates worst-case intervals through every op to a fixpoint):

    mul: |cols| <= 20*9500^2 < 2^30.75
         one widening carry step    -> |digits| <= 2^13 + 2^17.75
         fold high*608              -> 20 digits, |r| <= 609 * 2^17.76 < 2^27
         wrap round 1               -> limb0 in +-608*2^14, rest [-2^14, 8191+2^14]
         wrap round 2               -> limb0 [-1216, 9407], limb1 [-1217, 9408],
                                       rest [-2, 8193]
    add: x + y in [-2434, 19000] -> ONE wrap round -> [-608, 9407]
    sub: x - y + PAD (PAD = 32p with borrow-raised digits ~2^14.6 except the
         top, which may go transiently negative) -> ONE wrap round
         -> limb0 [-608, 9407], rest [1, 8195]
    sqr: via s = x + x (|s| <= 19000): cross columns use s_i * x_j so the
         doubling is free; |cols| <= 10*19000*9500 + 9500^2 < 2^31

``canon`` produces the unique canonical representative (< p, fully
normalized, via an exact sequential carry) for encoding/comparison only; it
first adds 8p (all of whose base-2^13 digits are >= 2047) so signed-weak
digits become non-negative without leaving its q-estimate range.
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
    "select", "vary_like", "to_bytes", "norm_to_bytes", "from_bytes",
    "sqrt_ratio",
    "WEAK_MAX", "WEAK_MIN",
]

WEAK_MAX = 9500
WEAK_MIN = -1217

# Static constant limb vectors -------------------------------------------------
_P_LIMBS = int_to_limbs(P)

# Subtraction pad: 32p with a borrow-raise (+2*2^13 at digit i, -2 at digit
# i+1) so all digits except the top are >= 2^14 > WEAK_MAX. The top digit
# (8189) can transiently underflow by <= 1311; the carry ops below use
# arithmetic shifts and masks, which are floor-exact for signed int32, so a
# stray -1 digit propagates correctly and two wrap steps restore weak-all
# (digits in [-1, 9500]).
_SUB_PAD = np.full(NLIMBS, (1 << 13) - 1 + 16384 - 2, dtype=np.int32)
_SUB_PAD[0] = (1 << 13) - 1 - 607 + 16384
_SUB_PAD[19] = (1 << 13) - 1 - 2
assert sum(int(v) << (BITS * i) for i, v in enumerate(_SUB_PAD)) == 32 * P

# canon's sign-lift pad: the plain base-2^13 digits of 8p (min digit 2047,
# enough to absorb the signed-weak underhang of -1217).
_CANON_PAD = int_to_limbs(8 * P)
assert min(int(v) for v in _CANON_PAD) >= 2047


def _const(v):
    return jnp.asarray(v, dtype=jnp.int32)


# ---------------------------------------------------------------------------
# Carry propagation
# ---------------------------------------------------------------------------
def _pcarry_widen(x):
    """One parallel carry step over the last axis, widening by one limb.
    value preserved exactly; output digits <= 2^13 - 1 + max_carry_in."""
    lo = x & MASK
    c = x >> BITS
    z = jnp.zeros(x.shape[:-1] + (1,), jnp.int32)
    return jnp.concatenate([lo, z], -1) + jnp.concatenate([z, c], -1)


def _pcarry_wrap(x):
    """One parallel carry step on 20 limbs with the 2^260 -> 608 wrap fold.
    Value preserved mod p."""
    lo = x & MASK
    c = x >> BITS
    wrap = jnp.concatenate([c[..., -1:] * FOLD, c[..., :-1]], -1)
    return lo + wrap


def _reduce20(cols):
    """Two wrap carry steps: any |column| <= 2^27 -> signed-weak limbs."""
    return _pcarry_wrap(_pcarry_wrap(cols))


def _reduce_product(cols):
    """Reduce 39 schoolbook columns (each < 2^30.75) to weak-all form."""
    d = _pcarry_widen(cols)                      # [..., 40], digits <= 2^17.76
    r = d[..., :NLIMBS] + FOLD * d[..., NLIMBS:]  # <= 609 * 2^17.76 < 2^27
    return _reduce20(r)


def _carry_seq(x, ncols):
    """Exact sequential signed carry (canonicalization paths only).
    Returns (digits in [0, 2^13), carry_out)."""
    c = jnp.zeros(x.shape[:-1], dtype=jnp.int32)
    outs = []
    for i in range(ncols):
        t = x[..., i] + c
        outs.append(t & MASK)
        c = t >> BITS
    return jnp.stack(outs, axis=-1), c


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
    """z = x + y (mod p), reference ecp_AddReduce (curve25519_mehdi.c:134).
    One wrap round: x + y in [-2434, 19000] -> limbs in [-608, 9407]."""
    return _pcarry_wrap(x + y)


def sub(x, y):
    """z = x - y (mod p), reference ecp_SubReduce (curve25519_mehdi.c:161).
    One wrap round: digits of x - y + PAD are in [13856, 35290] except the
    top in [-2528, 18906] -> limbs in [-608, 9407]."""
    return _pcarry_wrap(x - y + _const(_SUB_PAD))


def neg(y):
    return _pcarry_wrap(_const(_SUB_PAD) - y)


def _mul_cols(x, y):
    """Schoolbook product columns: cols[k] = sum_{i+j=k} x_i * y_j.

    Computed column-directly as an unrolled sum of [batch]-shaped products
    (400 elementwise mults XLA fuses into one kernel). The previous
    outer-product + pad/flatten/reshape shear materialized [batch, n, 2n]
    intermediates — ~300 MB of HBM traffic per 64K-batch sc.mul, the
    largest single glue item on the sign path's device timeline (r4 trace).
    Exact same per-column addition order (ascending i), so results are
    bit-identical. Replaces the reference's sequential row accumulation
    (ecp_mul_set/ecp_mul_add, curve25519_mehdi.c:91-101)."""
    n = NLIMBS
    batch = jnp.broadcast_shapes(x.shape[:-1], y.shape[:-1])
    x = jnp.broadcast_to(x, batch + (n,))
    y = jnp.broadcast_to(y, batch + (n,))
    xs = [x[..., i] for i in range(n)]
    ys = [y[..., j] for j in range(n)]
    cols = []
    for k in range(2 * n - 1):
        acc = None
        for i in range(max(0, k - n + 1), min(n, k + 1)):
            t = xs[i] * ys[k - i]
            acc = t if acc is None else acc + t
        cols.append(acc)
    return jnp.stack(cols, axis=-1)


def mul(x, y):
    """z = x * y (mod p), reference ecp_MulReduce (curve25519_mehdi.c:278)."""
    return _reduce_product(_mul_cols(x, y))


def sqr(x):
    """z = x^2 (mod p), reference ecp_SqrReduce (curve25519_mehdi.c:310)."""
    return _reduce_product(_mul_cols(x, x))


def mul_small_add(x, c, y):
    """z = x + c * y (mod p) for a small static constant c (c <= ~2^17).

    Reference ecp_WordMulAddReduce (curve25519_mehdi.c:243), used by the
    Montgomery ladder for the 121665 multiply. Bound: x + c*y <= 2^30.2."""
    d = _pcarry_widen(x + c * y)                 # [..., 21]
    r = d[..., :NLIMBS].at[..., 0].add(FOLD * d[..., NLIMBS])
    return _reduce20(r)


def select(mask, a, b):
    """Branchless select: a where mask else b. mask shape = batch shape."""
    return jnp.where(mask[..., None], a, b)


def vary_like(x, ref):
    """Numerical no-op that gives x the same device-variance (shard_map vma)
    as ref, so replicated constants (blinders, table entries) can enter scan
    carries alongside sharded batch data."""
    return x + (ref - ref)


# ---------------------------------------------------------------------------
# Canonicalization & comparison
# ---------------------------------------------------------------------------
def canon(x):
    """Full reduction to the canonical representative in [0, p).

    Reference ecp_Mod (curve25519_mehdi.c:185-209): branchless double
    conditional subtract. Signed-weak digits are first made non-negative by
    adding 8p (every base-2^13 digit of 8p is >= 2047 > 1217); the padded
    value is < 1.17 * 2^260 + 2^258 < 2 * 2^260, so the first exact carry's
    overflow c stays in {0, 1}; after folding it, estimate q = value >> 255
    from the top limb, subtract q*p (always non-negative), then one
    conditional subtract of p."""
    x = x + _const(_CANON_PAD)
    d, c = _carry_seq(x, NLIMBS)
    d = d.at[..., 0].add(FOLD * c)
    d, _ = _carry_seq(d, NLIMBS)          # value < 2^260, fully normalized
    q = d[..., 19] >> 8                   # bits 255.. of the value (0..31)
    t = d - q[..., None] * _const(_P_LIMBS)
    td, _ = _carry_seq(t, NLIMBS)         # value in [0, 2^255 + 589)
    u = td - _const(_P_LIMBS)
    ud, uc = _carry_seq(u, NLIMBS)        # uc == -1 iff value < p
    return jnp.where((uc == 0)[..., None], ud, td)


def is_zero(x):
    """True where x == 0 (mod p). Batch-shaped bool array."""
    return jnp.all(canon(x) == 0, axis=-1)


def eq(x, y):
    """True where x == y (mod p)."""
    return jnp.all(canon(x) == canon(y), axis=-1)


# ---------------------------------------------------------------------------
# Inversion / exponentiation (DJB addition chains, as in the reference)
# ---------------------------------------------------------------------------
def _sqr_times(x, n):
    """x^(2^n) via a fori_loop of squarings."""
    return jax.lax.fori_loop(0, n, lambda _, t: sqr(t), x)


def _chain_2_250(x):
    """Returns (x^(2^250 - 1), x^11, x^(2^50 - 1)). The shared prefix of the
    p-2 and (p-5)/8 addition chains (reference ecp_Inverse,
    curve25519_mehdi.c:340 and ecp_ModExp2523, ed25519_verify.c:116-135)."""
    x2 = sqr(x)                                   # 2
    x9 = mul(sqr(sqr(x2)), x)                     # 9
    x11 = mul(x9, x2)                             # 11
    x31 = mul(sqr(x11), x9)                       # 2^5 - 1
    t = mul(_sqr_times(x31, 5), x31)              # 2^10 - 1
    x10 = t
    t = mul(_sqr_times(t, 10), t)                 # 2^20 - 1
    t = mul(_sqr_times(t, 20), t)                 # 2^40 - 1
    t = mul(_sqr_times(t, 10), x10)               # 2^50 - 1
    x50 = t
    t = mul(_sqr_times(t, 50), t)                 # 2^100 - 1
    t = mul(_sqr_times(t, 100), t)                # 2^200 - 1
    t = mul(_sqr_times(t, 50), x50)               # 2^250 - 1
    return t, x11, x50


def inv(x):
    """x^(p-2) = 1/x (mod p) via the 254-squaring addition chain
    (reference ecp_Inverse, curve25519_mehdi.c:340)."""
    t, x11, _ = _chain_2_250(x)
    # p - 2 = (2^250 - 1) * 2^5 + 11
    return mul(_sqr_times(t, 5), x11)


def pow2523(x):
    """x^(2^252 - 3) = x^((p-5)/8), reference ecp_ModExp2523
    (ed25519_verify.c:116-135). Used for square roots in decompression."""
    t, _, _ = _chain_2_250(x)
    # 2^252 - 3 = (2^250 - 1) * 4 + 1
    return mul(_sqr_times(t, 2), x)


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
    chk = sub(mul(sqr(x), v), u)
    good = is_zero(chk)
    x = select(good, x, mul(x, from_int(SQRT_M1)))
    chk2 = sub(mul(sqr(x), v), u)
    return x, jnp.logical_or(good, is_zero(chk2))


# ---------------------------------------------------------------------------
# Byte codec (little-endian 32-byte strings, reference curve25519_utils.c)
#
# Byte-arithmetic, not bit-unpacking: limb i is bits [13i, 13i+13) of the
# 256-bit value, which always lie inside the three bytes starting at
# 13i // 8; byte j is bits [8j, 8j+8), which straddle at most two limbs.
# Static [20, 3] / [32] gather indices + shifts replace the [..., 256]
# bit-tensor intermediates (~40x fewer VPU ops; this path is ~10% of the
# X25519 wall-clock at batch 64K).
# ---------------------------------------------------------------------------
_FB_J = np.array([(13 * i) // 8 for i in range(NLIMBS)])         # start byte
_FB_S = np.array([(13 * i) % 8 for i in range(NLIMBS)], np.int32)
_TB_I = np.array([(8 * j) // 13 for j in range(32)])             # start limb
_TB_S = np.array([8 * j - 13 * ((8 * j) // 13) for j in range(32)], np.int32)


def norm_to_bytes(d):
    """NORMALIZED limbs (every digit in [0, 2^13), value < 2^256) -> 32-byte
    LE encoding. The raw byte-gather shared by fe.to_bytes (which canonicalizes
    first) and sc.to_bytes (whose inputs are canonical by contract)."""
    d = jnp.concatenate(
        [d, jnp.zeros(d.shape[:-1] + (1,), jnp.int32)], axis=-1)  # limb 20 = 0
    lo = d[..., _TB_I] >> _const(_TB_S)
    hi = d[..., _TB_I + 1] << (BITS - _const(_TB_S))
    return ((lo | hi) & 0xFF).astype(jnp.uint8)


def to_bytes(x):
    """Canonical little-endian 32-byte encoding: [..., 32] uint8.

    Reference ecp_WordsToBytes (curve25519_utils.c:61) composed with a full
    reduction (callers of the reference do ecp_Mod/MulMod first)."""
    return norm_to_bytes(canon(x))


def from_bytes(b):
    """[..., 32] uint8 little-endian -> limbs (normalized, NOT reduced mod p,
    matching reference ecp_BytesToWords semantics, curve25519_utils.c:43)."""
    b = b.astype(jnp.int32)
    b = jnp.concatenate(
        [b, jnp.zeros(b.shape[:-1] + (2,), jnp.int32)], axis=-1)  # [..., 34]
    w = (b[..., _FB_J] | (b[..., _FB_J + 1] << 8) | (b[..., _FB_J + 2] << 16))
    return (w >> _const(_FB_S)) & MASK
