"""sc25519 — scalar arithmetic mod the base-point order
l = 2^252 + 27742317777372353535851937790883648493.

TPU-native re-design of the reference's eco_* layer (reference:
source/curve25519_order.c). The reference reduces [b:X] one 32-bit word at a
time using the fact that -2^256 mod l is only 129 bits (eco_ReduceHiWord,
curve25519_order.c:74-107). Here we exploit that reduction is *linear* in the
limbs: the high limbs of a double-width product are folded down in one shot
with a precomputed 20x20 constant matrix FOLD_SC whose row i holds the limbs
of 2^(13*(20+i)) mod l — a single tiny integer matmul that XLA vectorizes,
replacing the reference's 8 sequential ReduceHiWord calls.

Canonicalization exploits l = 2^252 + delta with delta ~ 2^125 (the same
structure behind the reference's _w_NxBPO table, curve25519_order.c:46-63):
for a value V = q*2^252 + rem,  V - q*l = rem - q*delta, which is < 2^252 < l
and at worst one l-addition below zero — two branchless steps.

All values handed between public ops are canonical (< l, normalized limbs).
Shapes/batching conventions match curve25519_tpu.ops.fe.
"""

import jax
import jax.numpy as jnp
import numpy as np

from curve25519_tpu.config import BITS, ELL, NLIMBS, int_to_limbs
from curve25519_tpu.ops.fe import _carry_seq as _carry, _mul_cols, select

__all__ = [
    "from_int", "add", "sub_from_ell", "mul", "mod", "from_digest",
    "from_bytes", "from_bytes_raw", "to_bytes", "inv", "neg", "muladd",
    "mont_mul", "to_mont", "from_mont", "exp_mod_bpo",
]

_ELL_LIMBS = int_to_limbs(ELL)
_DELTA_LIMBS = int_to_limbs(ELL - 2**252)        # 125-bit delta

# FOLD_SC[i, j] = limb j of (2^(13*(20+i)) mod l); folding a normalized
# 40-limb value: low20 + high20 @ FOLD_SC, every column < 2^13 + 20*2^26 < 2^31.
_FOLD_SC = np.stack([
    int_to_limbs(pow(2, BITS * (NLIMBS + i), ELL)) for i in range(NLIMBS)
]).astype(np.int32)

# 2^260 mod l, for folding a single carry-out limb at position 260.
_R260 = int_to_limbs(pow(2, BITS * NLIMBS, ELL))


def _const(v):
    return jnp.asarray(v, dtype=jnp.int32)


def _canon(d, c):
    """Canonicalize value = d + c*2^260 (d: normalized 20 limbs, 0 <= c < 2^12)
    into [0, l). Branchless: subtract q*l via the delta identity, then add l
    back where negative."""
    q = (d[..., 19] >> 5) + (c << 8)              # value >> 252
    dlow = d.at[..., 19].set(d[..., 19] & 0x1F)   # value mod 2^252
    t = dlow - q[..., None] * _const(_DELTA_LIMBS)
    td, tc = _carry(t, NLIMBS)
    u = td + _const(_ELL_LIMBS)
    ud, _ = _carry(u, NLIMBS)
    return jnp.where((tc < 0)[..., None], ud, td)


def _reduce40(cols40):
    """Reduce 40 normalized-or-small columns (|col| < 2^30.4) mod l."""
    low, high = cols40[..., :NLIMBS], cols40[..., NLIMBS:]
    r = low + jnp.einsum("...i,ij->...j", high, _const(_FOLD_SC))
    d2, c2 = _carry(r, NLIMBS)                    # c2 < 2^11
    r2 = d2 + c2[..., None] * _const(_R260)
    d3, c3 = _carry(r2, NLIMBS)                   # c3 <= ~11
    return _canon(d3, c3)


def _reduce_product(cols):
    """Reduce the 39 schoolbook columns of a 20x20 limb product mod l."""
    d, c = _carry(cols, 2 * NLIMBS - 1)           # exact; c < 2^13
    wide = jnp.concatenate([d, c[..., None]], axis=-1)
    return _reduce40(wide)


# ---------------------------------------------------------------------------
# Public ops
# ---------------------------------------------------------------------------
def from_int(v, shape=()):
    x = _const(int_to_limbs(v % ELL))
    return jnp.broadcast_to(x, tuple(shape) + (NLIMBS,))


def mod(x):
    """Reduce a (weakly) normalized < ~2^260 limb value mod l.
    Reference eco_Mod (curve25519_order.c:124-129)."""
    d, c = _carry(x, NLIMBS)
    return _canon(d, c)


def add(x, y):
    """z = x + y mod l for canonical inputs.
    Reference eco_AddReduce (curve25519_order.c:132-136)."""
    d, _ = _carry(x + y, NLIMBS)                  # value < 2l < 2^254
    t = d - _const(_ELL_LIMBS)
    td, tc = _carry(t, NLIMBS)
    return jnp.where((tc < 0)[..., None], d, td)


def neg(x):
    """z = l - x for canonical x (returns l's limbs when x == 0, matching the
    reference blinding setup ecp_Sub(bl, _w_BPO, t), ed25519_sign.c:319;
    downstream scalar use treats l = 0 mod l identically)."""
    return sub_from_ell(x)


def sub_from_ell(x):
    d, _ = _carry(_const(_ELL_LIMBS) - x, NLIMBS)
    return d


def mul(x, y):
    """z = x * y mod l, reference eco_MulReduce (curve25519_order.c:109-122)."""
    return _reduce_product(_mul_cols(x, y))


def muladd(x, y, z):
    """x*y + z mod l (the S = t*a + r step of signing, ed25519_sign.c:411-413)."""
    return add(mul(x, y), z)


def from_bytes(b):
    """32 little-endian bytes -> canonical scalar mod l."""
    from curve25519_tpu.ops import fe
    return mod(fe.from_bytes(b))


def from_bytes_raw(b):
    """32 bytes -> limbs without reduction (reference ecp_BytesToWords)."""
    from curve25519_tpu.ops import fe
    return fe.from_bytes(b)


def to_bytes(x):
    """Canonical scalar -> 32 little-endian bytes (reference
    ecp_WordsToBytes). Byte-arithmetic static gather — no bit-tensor
    intermediate (the fe.to_bytes pattern; inputs are canonical normalized
    limbs by this module's contract, so no reduction is needed)."""
    from curve25519_tpu.ops import fe
    return fe.norm_to_bytes(x)


# from_digest gather tables: limb i of the 40-limb view holds bits
# [13i, 13i+13) of the 512-bit LE digest, which lie inside the three bytes
# starting at (13i)//8 (digest padded to 66 bytes so the gather stays in
# range; bits past 511 read zeros).
_FD_J = np.array([(13 * i) // 8 for i in range(2 * NLIMBS)])
_FD_S = np.array([(13 * i) % 8 for i in range(2 * NLIMBS)], np.int32)


def from_digest(md):
    """512-bit digest ([..., 64] uint8, little-endian) -> canonical scalar.
    Reference eco_DigestToWords (curve25519_order.c:138-155) composed with
    eco_Mod, i.e. the result is already canonical. Byte-arithmetic form of
    the 64-byte -> 40-limb split (no 512-wide bit tensor)."""
    from curve25519_tpu.config import MASK
    b = md.astype(jnp.int32)
    b = jnp.concatenate(
        [b, jnp.zeros(b.shape[:-1] + (2,), jnp.int32)], axis=-1)  # [..., 66]
    w = (b[..., _FD_J] | (b[..., _FD_J + 1] << 8) | (b[..., _FD_J + 2] << 16))
    cols = (w >> _const(_FD_S)) & MASK
    return _reduce40(cols)


def inv(x):
    """1/x mod l via x^(l-2) (square-and-multiply scan). Selftest-level API
    (reference eco_InvModBPO, test/curve25519_selftest.c:243-260)."""
    e = ELL - 2
    bits = jnp.asarray([(e >> i) & 1 for i in range(251, -1, -1)],
                       dtype=jnp.int32)

    def body(t, bit):
        t = mul(t, t)
        return select(jnp.full(t.shape[:-1], bit, jnp.int32) == 1,
                      mul(t, x), t), None

    t, _ = jax.lax.scan(body, x, bits)
    return t


# ---------------------------------------------------------------------------
# Montgomery form mod l (selftest-level API parity)
#
# The reference implements REDC word-serially with -1/l mod 2^64
# (eco_MontMul, test/curve25519_selftest.c:182-242). On TPU the folded-matrix
# reduction above already fully reduces a double-width product in one shot,
# so Montgomery form needs no serial REDC: x*y/R is just a multiply by the
# constant R^-1 mod l. Same R = 2^256 radix and identical semantics.
# ---------------------------------------------------------------------------
_R_MONT = pow(2, 256, ELL)
_RINV_MONT = pow(_R_MONT, ELL - 2, ELL)


def mont_mul(x, y):
    """z = x*y/R mod l (reference eco_MontMul)."""
    return mul(mul(x, y), from_int(_RINV_MONT))


def to_mont(x):
    """y = x*R mod l (reference eco_ToMont)."""
    return mul(x, from_int(_R_MONT))


def from_mont(x):
    """y = x/R mod l (reference eco_FromMont)."""
    return mul(x, from_int(_RINV_MONT))


def exp_mod_bpo(x, e_bytes):
    """y = x^E mod l for a runtime exponent E of [..., n] little-endian
    bytes (reference eco_ExpModBPO, test/curve25519_selftest.c:258-275:
    bytes consumed most-significant first). Constant-time square-and-multiply
    scan over all 8n bits."""
    e_bytes = jnp.asarray(e_bytes, jnp.uint8).astype(jnp.int32)
    n = e_bytes.shape[-1]
    # bit sequence MSB-first: byte n-1 .. 0, bit 7 .. 0 within each byte
    shifts = jnp.arange(7, -1, -1, dtype=jnp.int32)
    bits = (e_bytes[..., ::-1, None] >> shifts) & 1   # [..., n, 8] MSB-first
    bits = bits.reshape(bits.shape[:-2] + (8 * n,))
    bseq = jnp.moveaxis(bits, -1, 0)                  # [8n, ...]

    def body(t, bit):
        t = mul(t, t)
        return select(bit == 1, mul(t, x), t), None

    t, _ = jax.lax.scan(body, from_int(1, x.shape[:-1]), bseq)
    return t
