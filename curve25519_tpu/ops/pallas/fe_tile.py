"""In-kernel field arithmetic on VPU-tiled limb tensors.

This is the Pallas counterpart of curve25519_tpu.ops.fe, operating on values
of shape ``[NLIMBS, S, L]`` where (S, L) = (8, 128) is a full VPU tile: every
limb row is one native vector op for 1024 batch lanes. The radix, bounds, and
carry scheme are identical to ops/fe.py (signed-weak invariant, parallel
carries, 2^260 = 608 fold) — see that module's docstring for the bound
analysis (mechanically verified by tests/test_bounds.py). The reference
anchors are the same (source/curve25519_mehdi.c field core).

These helpers take/return plain jnp values (registers/VMEM-resident inside a
kernel); they contain no pallas_call themselves.
"""

import jax
import jax.numpy as jnp

from curve25519_tpu.config import BITS, FOLD, MASK, NLIMBS

TILE_S = 8
TILE_L = 128
TILE_BATCH = TILE_S * TILE_L


def t_const(values):
    """[NLIMBS, 1, 1] int32 constant limb vector built from python ints via
    iota-compare (Pallas kernels cannot capture array constants)."""
    rows = jax.lax.broadcasted_iota(jnp.int32, (NLIMBS, 1, 1), 0)
    out = jnp.full((NLIMBS, 1, 1), int(values[0]), jnp.int32)
    for i in range(1, NLIMBS):
        if int(values[i]) != int(values[0]):
            out = jnp.where(rows == i, int(values[i]), out)
    return out


def t_pad():
    """The 32p subtraction pad (see fe._SUB_PAD) as an in-kernel constant."""
    from curve25519_tpu.ops import fe
    return t_const(fe._SUB_PAD)


def tile_lanes(x, g):
    """[B, K] -> [G, K, TILE_S, TILE_L] limb/digit-major tiling (B = G*1024)."""
    k = x.shape[-1]
    return x.reshape(g, TILE_S, TILE_L, k).transpose(0, 3, 1, 2)


def untile_lanes(x_t):
    """[G, K, TILE_S, TILE_L] -> [G*1024, K]."""
    g, k = x_t.shape[0], x_t.shape[1]
    return x_t.transpose(0, 2, 3, 1).reshape(g * TILE_BATCH, k)


def zeros_like_row(x):
    return jnp.zeros_like(x[0])


def t_add(x, y):
    """z = x + y mod p (signed-weak in/out; one wrap round suffices — see
    ops/fe.py bound analysis, verified by tests/test_bounds.py)."""
    return _carry1(x + y)


def t_sub(x, y, pad):
    """z = x - y mod p; `pad` is the 32p borrow-raised pad broadcast to
    [NLIMBS, 1, 1] (see fe._SUB_PAD). One wrap round."""
    return _carry1(x - y + pad)


def t_neg(y, pad):
    """z = -y mod p. One wrap round."""
    return _carry1(pad - y)


def _carry1(r):
    lo = r & MASK
    c = r >> BITS
    wrap = jnp.concatenate([c[-1:] * FOLD, c[:-1]], axis=0)
    return lo + wrap


def _carry2(r):
    return _carry1(_carry1(r))


def _reduce_cols(cols):
    """cols: [2*NLIMBS-1, S, L] schoolbook columns -> weak-all limbs."""
    lo = cols & MASK
    c = cols >> BITS
    z = jnp.zeros_like(cols[:1])
    d = jnp.concatenate([lo, z], 0) + jnp.concatenate([z, c], 0)  # [40,S,L]
    r = d[:NLIMBS] + FOLD * d[NLIMBS:]
    return _carry2(r)


def t_mul(x, y):
    """z = x * y mod p. 400 tile-mults + column adds, fully unrolled —
    each term is one VPU op over the (8,128) tile."""
    n = NLIMBS
    cols = [None] * (2 * n - 1)
    for i in range(n):
        xi = x[i]
        row = xi[None] * y                       # [n, S, L]
        for j in range(n):
            k = i + j
            cols[k] = row[j] if cols[k] is None else cols[k] + row[j]
    return _reduce_cols(jnp.stack(cols, axis=0))


def t_sqr(x):
    """z = x^2 mod p using the symmetric shortcut with pre-doubled operand:
    s = x + x, cross terms s_i * x_j (the doubling is free), ~210 tile-mults
    and no per-term doubling adds. |s| <= 19000 keeps every column < 2^31
    (ops/fe.py bound analysis). Columns equal t_mul(x, x)'s exactly, so the
    jnp twin (fe.sqr) stays bit-identical."""
    n = NLIMBS
    s = x + x
    cols = [None] * (2 * n - 1)

    def acc(k, v):
        cols[k] = v if cols[k] is None else cols[k] + v

    for i in range(n):
        acc(2 * i, x[i] * x[i])
        for j in range(i + 1, n):
            acc(i + j, s[i] * x[j])
    return _reduce_cols(jnp.stack(cols, axis=0))


def t_mul_small_add(x, c, y):
    """z = x + c*y mod p for small static c (<= ~2^17)."""
    t = x + c * y                                # <= 2^30.2
    lo = t & MASK
    cr = t >> BITS
    z = jnp.zeros_like(t[:1])
    d = jnp.concatenate([lo, z], 0) + jnp.concatenate([z, cr], 0)  # [21,S,L]
    r = jnp.concatenate([d[0:1] + FOLD * d[NLIMBS:], d[1:NLIMBS]], 0)
    return _carry2(r)


def t_select(mask, a, b):
    """mask: [S, L] (or broadcastable) int/bool; a where mask else b."""
    return jnp.where(mask[None] != 0, a, b)


def t_sqr_times(x, n):
    return jax.lax.fori_loop(0, n, lambda _, t: t_sqr(t), x)


def _t_chain_2_250(x):
    """(x^(2^250 - 1), x^11): shared prefix of the p-2 and (p-5)/8 chains
    (cf. fe._chain_2_250)."""
    x2 = t_sqr(x)
    x9 = t_mul(t_sqr(t_sqr(x2)), x)
    x11 = t_mul(x9, x2)
    x31 = t_mul(t_sqr(x11), x9)
    t = t_mul(t_sqr_times(x31, 5), x31)          # 2^10 - 1
    x10 = t
    t = t_mul(t_sqr_times(t, 10), t)             # 2^20 - 1
    t = t_mul(t_sqr_times(t, 20), t)             # 2^40 - 1
    t = t_mul(t_sqr_times(t, 10), x10)           # 2^50 - 1
    x50 = t
    t = t_mul(t_sqr_times(t, 50), t)             # 2^100 - 1
    t = t_mul(t_sqr_times(t, 100), t)            # 2^200 - 1
    t = t_mul(t_sqr_times(t, 50), x50)           # 2^250 - 1
    return t, x11


def t_inv(x):
    """1/x via the 254-squaring DJB chain (cf. fe.inv)."""
    t, x11 = _t_chain_2_250(x)
    return t_mul(t_sqr_times(t, 5), x11)


def t_pow2523(x):
    """x^(2^252 - 3) = x^((p-5)/8) (cf. fe.pow2523)."""
    t, _ = _t_chain_2_250(x)
    return t_mul(t_sqr_times(t, 2), x)


def t_carry_seq(x):
    """Exact sequential signed carry over the limb axis (canonicalization
    only; cf. fe._carry_seq). Returns (digits, carry_out [S, L])."""
    c = x[0] - x[0]
    outs = []
    for i in range(NLIMBS):
        t = x[i] + c
        outs.append(t & MASK)
        c = t >> BITS
    return jnp.stack(outs, axis=0), c


def t_canon(x):
    """Unique canonical representative in [0, p) (cf. fe.canon). The 8p
    pre-pad lifts signed-weak digits non-negative before the exact carries."""
    from curve25519_tpu.ops import fe
    p_limbs = t_const(fe._P_LIMBS)
    d, c = t_carry_seq(x + t_const(fe._CANON_PAD))
    d = jnp.concatenate([d[0:1] + FOLD * c[None], d[1:]], axis=0)
    d, _ = t_carry_seq(d)
    q = d[NLIMBS - 1] >> 8
    t = d - q[None] * p_limbs
    td, _ = t_carry_seq(t)
    u = td - p_limbs
    ud, uc = t_carry_seq(u)
    return jnp.where((uc == 0)[None], ud, td)


def t_is_zero(x):
    """[S, L] bool: x == 0 (mod p)."""
    c = t_canon(x)
    acc = c[0] == 0
    for i in range(1, NLIMBS):
        acc = jnp.logical_and(acc, c[i] == 0)
    return acc


def t_norm_to_bytes(d):
    """CANONICAL limb tiles [NLIMBS, S, L] -> 32 LE byte rows [32, S, L]
    int32 (values in [0, 256)). In-kernel twin of fe.norm_to_bytes: the
    byte<->limb straddle indices are compile-time constants, so each output
    byte is two static row reads + shifts — no gather. Running this (and
    t_canon) inside the kernel keeps the pack epilogue off the lane-wasting
    [B, 20] host-side layout (the measured inter-kernel glue, VERDICT r3)."""
    from curve25519_tpu.ops import fe
    d21 = jnp.concatenate([d, jnp.zeros_like(d[:1])], axis=0)
    rows = []
    for j in range(32):
        i = int(fe._TB_I[j])
        s = int(fe._TB_S[j])
        rows.append(((d21[i] >> s) | (d21[i + 1] << (BITS - s))) & 0xFF)
    return jnp.stack(rows, axis=0)


def t_to_bytes(x):
    """Weak limbs -> canonical 32 LE byte rows [32, S, L] (fe.to_bytes)."""
    return t_norm_to_bytes(t_canon(x))


def t_pack_point(x, y):
    """Affine (x, y) weak limb tiles -> compressed point byte rows
    [32, S, L]: enc(y) with parity(x) in bit 7 of byte 31 (the models
    _pack / reference ed25519_PackPoint epilogue, done in-kernel)."""
    xc = t_canon(x)
    rows = t_to_bytes(y)
    hi = (rows[31] & 0x7F) | ((xc[0] & 1) << 7)
    return jnp.concatenate([rows[:31], hi[None]], axis=0)
