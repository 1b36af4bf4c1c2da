"""In-kernel sc25519 (mod-l) arithmetic on VPU-tiled limb tensors.

Pallas counterpart of curve25519_tpu.ops.sc, operating on [NLIMBS, S, L]
tiles ((S, L) = (8, 128) — one VPU tile per limb row, 1024 lanes), the same
way fe_tile mirrors ops/fe. Bit-exact with the jnp twin: every routine
performs the identical integer arithmetic (the FOLD_SC matrix contraction,
the delta-identity canonicalization), just with the 20x20 constant matrices
unrolled into per-limb python-int immediates — Pallas kernels cannot capture
array constants, and scalar immediates are also faster than SMEM loads
inside hot loops (CLAUDE.md pitfalls).

These helpers exist so the whole Ed25519 sign/keygen data path (SHA-512 ->
digest reduction mod l -> fold cut -> base mult -> S = h*a + r) can run in
ONE kernel launch with no [B, 20] scalar glue between launches. Reference
anchors match ops/sc.py (source/curve25519_order.c eco_* layer).
"""

import jax.numpy as jnp
import numpy as np

from curve25519_tpu.config import BITS, MASK, NLIMBS
from curve25519_tpu.ops import fold as fold_jnp
from curve25519_tpu.ops import sc as sc_jnp

__all__ = [
    "sc_carry", "sc_canon", "sc_reduce40", "sc_mod", "sc_add", "sc_mul",
    "sc_muladd", "sc_from_digest_rows", "limbs_from_byte_rows",
    "bytes_from_halves", "halves_from_byte_rows", "cut8_rows", "clamp_rows",
]

_ELL = [int(v) for v in sc_jnp._ELL_LIMBS]
_DELTA = [int(v) for v in sc_jnp._DELTA_LIMBS]
_R260 = [int(v) for v in sc_jnp._R260]
_FOLD_SC = np.asarray(sc_jnp._FOLD_SC)          # [20, 20] python-int source


def sc_carry(x, n):
    """Exact sequential signed carry over `n` stacked rows [n, S, L].
    Returns (digits [n, S, L] in [0, 2^13), carry_out [S, L]) — the tile twin
    of fe._carry_seq / sc's `_carry`. The zero seed is anchored to a loaded
    value (x - x) so loop-carried layouts stay concrete."""
    c = x[0] - x[0]
    outs = []
    for i in range(n):
        t = x[i] + c
        outs.append(t & MASK)
        c = t >> BITS
    return jnp.stack(outs, axis=0), c


def sc_canon(d, c):
    """Canonicalize value = d + c*2^260 into [0, l) (twin of sc._canon:
    subtract q*l via l = 2^252 + delta, then add l back where negative)."""
    q = (d[NLIMBS - 1] >> 5) + (c << 8)          # value >> 252
    rows = [d[i] for i in range(NLIMBS)]
    rows[NLIMBS - 1] = rows[NLIMBS - 1] & 0x1F   # value mod 2^252
    t = jnp.stack([rows[i] - q * _DELTA[i] if _DELTA[i] else rows[i]
                   for i in range(NLIMBS)], axis=0)
    td, tc = sc_carry(t, NLIMBS)
    u = jnp.stack([td[i] + _ELL[i] if _ELL[i] else td[i]
                   for i in range(NLIMBS)], axis=0)
    ud, _ = sc_carry(u, NLIMBS)
    return jnp.where((tc < 0)[None], ud, td)


def sc_reduce40(cols40):
    """Reduce 40 normalized-or-small columns [40, S, L] mod l (twin of
    sc._reduce40): fold the high 20 columns down with the FOLD_SC matrix —
    here an unrolled multiply-accumulate with int immediates (400 tile-MACs,
    ~one t_mul's worth of VPU work)."""
    low, high = cols40[:NLIMBS], cols40[NLIMBS:]
    rows = []
    for k in range(NLIMBS):
        acc = low[k]
        for i in range(NLIMBS):
            f = int(_FOLD_SC[i, k])
            if f:
                acc = acc + high[i] * f
        rows.append(acc)
    d2, c2 = sc_carry(jnp.stack(rows, axis=0), NLIMBS)       # c2 < 2^11
    r2 = jnp.stack([d2[i] + c2 * _R260[i] if _R260[i] else d2[i]
                    for i in range(NLIMBS)], axis=0)
    d3, c3 = sc_carry(r2, NLIMBS)                            # c3 <= ~11
    return sc_canon(d3, c3)


def sc_mod(x):
    """Reduce a weakly-normalized < ~2^260 value mod l (twin of sc.mod)."""
    d, c = sc_carry(x, NLIMBS)
    return sc_canon(d, c)


def sc_add(x, y):
    """z = x + y mod l for canonical inputs (twin of sc.add)."""
    d, _ = sc_carry(x + y, NLIMBS)               # value < 2l < 2^254
    t = jnp.stack([d[i] - _ELL[i] if _ELL[i] else d[i]
                   for i in range(NLIMBS)], axis=0)
    td, tc = sc_carry(t, NLIMBS)
    return jnp.where((tc < 0)[None], d, td)


def sc_mul(x, y):
    """z = x * y mod l (twin of sc.mul): 20x20 schoolbook columns (every
    column sum < 20 * 2^26 < 2^31), exact carry to 39 digits + carry-out,
    then the FOLD_SC reduction."""
    n = NLIMBS
    cols = [None] * (2 * n - 1)
    for i in range(n):
        xi = x[i]
        for j in range(n):
            k = i + j
            t = xi * y[j]
            cols[k] = t if cols[k] is None else cols[k] + t
    d, c = sc_carry(jnp.stack(cols, axis=0), 2 * n - 1)      # c < 2^13
    wide = jnp.concatenate([d, c[None]], axis=0)             # [40, S, L]
    return sc_reduce40(wide)


def sc_muladd(x, y, z):
    """x*y + z mod l — the S = t*a + r step of signing (twin of sc.muladd,
    reference ed25519_sign.c:411-413)."""
    return sc_add(sc_mul(x, y), z)


# from_digest gather tables (same layout constants as sc.from_digest)
_FD_J = [int(v) for v in sc_jnp._FD_J]
_FD_S = [int(v) for v in sc_jnp._FD_S]


def sc_from_digest_rows(byrows):
    """512-bit digest as 64 little-endian byte rows [64, S, L] int32 ->
    canonical scalar [NLIMBS, S, L] (twin of sc.from_digest): limb i of the
    40-limb view reads bits [13i, 13i+13) out of a static 3-byte window."""
    z = jnp.zeros_like(byrows[:1])
    b = jnp.concatenate([byrows, z, z], axis=0)              # [66, S, L]
    cols = []
    for i in range(2 * NLIMBS):
        j, s = _FD_J[i], _FD_S[i]
        w = b[j] | (b[j + 1] << 8) | (b[j + 2] << 16)
        cols.append((w >> s) & MASK)
    return sc_reduce40(jnp.stack(cols, axis=0))


# byte <-> limb straddle tables (same constants as fe.from_bytes)
def limbs_from_byte_rows(byrows):
    """32 LE byte rows [32, S, L] int32 -> normalized limbs [NLIMBS, S, L]
    (twin of fe.from_bytes; value NOT reduced — reference ecp_BytesToWords
    semantics)."""
    from curve25519_tpu.ops import fe
    z = jnp.zeros_like(byrows[:1])
    b = jnp.concatenate([byrows, z, z], axis=0)              # [34, S, L]
    rows = []
    for i in range(NLIMBS):
        j, s = int(fe._FB_J[i]), int(fe._FB_S[i])
        w = b[j] | (b[j + 1] << 8) | (b[j + 2] << 16)
        rows.append((w >> s) & MASK)
    return jnp.stack(rows, axis=0)


def bytes_from_halves(halves):
    """[k, S, L] uint32 big-endian half-words -> [4k, S, L] int32 byte rows
    in stream order (byte 4i+j = bits [24-8j, 32-8j) of half i). Applied to
    a SHA-512 state in (hi, lo) row order this yields the digest's bytes in
    standard (little-endian-value) index order."""
    rows = []
    for i in range(halves.shape[0]):
        h = halves[i]
        for j in range(4):
            rows.append(((h >> jnp.uint32(24 - 8 * j)) &
                         jnp.uint32(0xFF)).astype(jnp.int32))
    return jnp.stack(rows, axis=0)


def halves_from_byte_rows(byrows):
    """[4k, S, L] int32 byte rows (values in [0, 256)) -> [k, S, L] uint32
    big-endian half-words (inverse of bytes_from_halves) — for splicing
    in-kernel byte strings (enc(R)) into SHA-512 message words."""
    n = byrows.shape[0] // 4
    rows = []
    for i in range(n):
        b = [byrows[4 * i + j].astype(jnp.uint32) for j in range(4)]
        rows.append((b[0] << 24) | (b[1] << 16) | (b[2] << 8) | b[3])
    return jnp.stack(rows, axis=0)


# 8-fold cut tables (same bit-position constants as fold.cut8_limbs)
_LI8 = fold_jnp._LI8
_LSH8 = fold_jnp._LSH8


def cut8_rows(d):
    """NORMALIZED limb rows [NLIMBS, S, L] -> python list of 32 [S, L] int32
    8-fold digits (twin of fold.cut8_limbs — digit c bit j = scalar bit
    32j + 31 - c, straight from the limb encoding)."""
    digits = []
    for c in range(32):
        acc = None
        for j in range(8):
            bit = (d[int(_LI8[c, j])] >> int(_LSH8[c, j])) & 1
            v = bit << j if j else bit
            acc = v if acc is None else acc | v
        digits.append(acc)
    return digits


def clamp_rows(byrows):
    """RFC 7748/8032 secret clamping on 32 LE byte rows [32, S, L] int32
    (twin of codec.clamp): byte0 &= 0xF8; byte31 = (byte31 & 0x7F) | 0x40."""
    rows = [byrows[i] for i in range(32)]
    rows[0] = rows[0] & 0xF8
    rows[31] = (rows[31] & 0x7F) | 0x40
    return jnp.stack(rows, axis=0)
