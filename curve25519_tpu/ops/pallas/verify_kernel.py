"""Pallas double-scalar-multiply kernel for Ed25519 verification.

Computes R' = s*G + h*(-Q) — the reference's edp_PolyPointMultiply
(source/ed25519_verify.c:243-280): 8-folds of s against the global base
table interleaved with 4-folds of h against the per-key 16-entry q_table,
31 x (double + PE add) then 32 x (double + affine add + PE add), plus the
final affine normalization — all in one kernel launch per 1024-lane tile.

Two different constant-time gathers per step:
- the 256-entry base folding table is shared by every lane → one-hot int8
  matmul on the MXU (same as edwards_kernel._gather_pa);
- the 16-entry q_table differs per lane (it is the per-pubkey Verify_Init
  precompute) → a 4-level branchless select tree on the VPU over the
  VMEM-resident [16, 4*NLIMBS] per-lane tables.

Verify operates on public data, so uniformity is not required for safety —
but fixed-shape branch-free execution is how TPUs run fast anyway.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from curve25519_tpu.config import ED_DI, NLIMBS, int_to_limbs
from curve25519_tpu.ops.pallas import edwards_kernel as ek
from curve25519_tpu.ops.pallas import fe_tile as ft

__all__ = ["poly_mult_tiled", "poly_mult_tiled_shared", "poly_mult_pallas",
           "qplanes_shared", "verify_init_tiled", "verify_init_pallas",
           "verify_oneshot_tiled", "verify_oneshot_pallas"]

_QROWS = 4 * NLIMBS          # ypx, ymx, t2d, z2 limbs per q_table entry


def _unpack_qt(qt8):
    """In-kernel int8-plane -> int32 limb unpack of the per-lane q_table.

    qt8: [16*2*_QROWS, S, L] int8, entry-major, each entry 80 lo-plane rows
    then 80 hi-plane rows (the models/tables.pe_planes_from_array layout).
    Shipping int8 and unpacking here halves the table's HBM/VMEM footprint
    per verify lane (2.5 KB instead of 5 KB — the reference's q_table is
    likewise its compact in-memory form, ed25519_verify.c:44-47)."""
    per = 2 * _QROWS
    out = []
    for e in range(16):
        lo = qt8[e * per:e * per + _QROWS].astype(jnp.int32)
        hi = qt8[e * per + _QROWS:(e + 1) * per].astype(jnp.int32)
        out.append(lo + (hi << 7))
    return out


def _gather_qt(entries, idx):
    """Per-lane 16-entry table fetch via a binary select tree.

    entries: list of 16 [_QROWS, S, L] int32 tiles; idx: [S, L] int32 in
    [0, 16). Returns (ypx, ymx, t2d, z2) limb tiles."""
    lvl = list(entries)
    for bit in range(4):
        mask = ((idx >> bit) & 1) != 0
        lvl = [jnp.where(mask[None], lvl[2 * i + 1], lvl[2 * i])
               for i in range(len(lvl) // 2)]
    q = lvl[0]
    return (q[:NLIMBS], q[NLIMBS:2 * NLIMBS],
            q[2 * NLIMBS:3 * NLIMBS], q[3 * NLIMBS:])


def _gather_qt_shared(qplanes, idx):
    """Shared-pk q_table fetch: one-hot int8 matmul against the single
    [2*_QROWS, 16] plane operand every lane shares (same MXU trick as the
    base folding table, edwards_kernel._gather_pa). Exact: plane values are
    <= 127 and one-hot entries fit int8; the MXU accumulates into int32."""
    iota = jax.lax.broadcasted_iota(jnp.int32, (16, ft.TILE_S, ft.TILE_L), 0)
    oh = (iota == idx[None]).astype(jnp.int8).reshape(16, ft.TILE_BATCH)
    vals = jax.lax.dot(qplanes, oh,
                       preferred_element_type=jnp.int32)  # [2*_QROWS, 1024]
    vals = vals.reshape(2 * _QROWS, ft.TILE_S, ft.TILE_L)
    q = vals[:_QROWS] + (vals[_QROWS:] << 7)
    return (q[:NLIMBS], q[NLIMBS:2 * NLIMBS],
            q[2 * NLIMBS:3 * NLIMBS], q[3 * NLIMBS:])


def _poly_kernel(u_ref, v_ref, qt_ref, planes_ref, orb_ref, *,
                 shared_qt=False):
    pad = ft.t_pad()
    planes = planes_ref[...]
    if shared_qt:
        qp = qt_ref[...]

        def gather_qt(idx):
            return _gather_qt_shared(qp, idx)
    else:
        qt = _unpack_qt(qt_ref[0])

        def gather_qt(idx):
            return _gather_qt(qt, idx)

    # init from q_table[v[0]]: (x, y, z, t) = (YpX-YmX, YpX+YmX, Z2, T2d/2d)
    ypx, ymx, t2d, z2 = gather_qt(v_ref[0, 0])
    x = ft.t_sub(ypx, ymx, pad)
    y = ft.t_add(ypx, ymx)
    di = jnp.broadcast_to(ft.t_const(int_to_limbs(ED_DI)), t2d.shape)
    t = ft.t_mul(t2d, di)
    st = (x, y, z2, t)

    def step1(i, st):
        st = ek._double(st, pad)
        q = gather_qt(v_ref[0, i])
        return ek._add_pe(st, *q, pad)

    st = jax.lax.fori_loop(1, 32, step1, st)

    def step2(i, st):
        st = ek._double(st, pad)
        pa = ek._gather_pa(planes, u_ref[0, i - 32])
        st = ek._add_pa(st, *pa, pad)
        q = gather_qt(v_ref[0, i])
        return ek._add_pe(st, *q, pad)

    st = jax.lax.fori_loop(32, 64, step2, st)

    x, y, z, _ = st
    zi = ft.t_inv(z)
    # emit enc(R') directly: canon + compression run in-kernel, so the
    # byte-compare against the signature outside is pure elementwise work
    orb_ref[0] = ft.t_pack_point(ft.t_mul(x, zi), ft.t_mul(y, zi))


@functools.partial(jax.jit, static_argnames=("interpret",))
def poly_mult_tiled(u_t, v_t, qt_t, interpret=False):
    """u_t: [G, 32, 8, 128] 8-fold digits of s; v_t: [G, 64, 8, 128] 4-fold
    digits of h; qt_t: [G, 16*8*NLIMBS, 8, 128] int8 per-lane q_table planes
    (entry-major, lo rows then hi rows per entry — unpacked in-kernel).
    Returns enc(R') byte rows [G, 32, 8, 128] int32."""
    g = u_t.shape[0]

    def spec(k):
        return pl.BlockSpec((1, k, ft.TILE_S, ft.TILE_L),
                            lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM)

    planes_spec = pl.BlockSpec((2 * ek._W, 256), lambda i: (0, 0),
                               memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((g, 32, ft.TILE_S, ft.TILE_L),
                                     jnp.int32)
    return pl.pallas_call(
        _poly_kernel,
        grid=(g,),
        in_specs=[spec(32), spec(64), spec(16 * 2 * _QROWS), planes_spec],
        out_specs=spec(32),
        out_shape=out_shape,
        interpret=interpret,
    )(u_t, v_t, qt_t, ek.folding8_planes_T())


@functools.partial(jax.jit, static_argnames=("interpret",))
def poly_mult_tiled_shared(u_t, v_t, qplanes, interpret=False):
    """Shared-pk variant: one q_table for every lane (the common one-pk ×
    many-messages amortization Verify_Init exists for,
    ed25519_verify.c:179-232). qplanes: [2*_QROWS, 16] int8 plane operand —
    ~5 KB total instead of 2.5 KB *per lane* of HBM traffic."""
    g = u_t.shape[0]

    def spec(k):
        return pl.BlockSpec((1, k, ft.TILE_S, ft.TILE_L),
                            lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM)

    qp_spec = pl.BlockSpec((2 * _QROWS, 16), lambda i: (0, 0),
                           memory_space=pltpu.VMEM)
    planes_spec = pl.BlockSpec((2 * ek._W, 256), lambda i: (0, 0),
                               memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((g, 32, ft.TILE_S, ft.TILE_L),
                                     jnp.int32)
    return pl.pallas_call(
        functools.partial(_poly_kernel, shared_qt=True),
        grid=(g,),
        in_specs=[spec(32), spec(64), qp_spec, planes_spec],
        out_specs=spec(32),
        out_shape=out_shape,
        interpret=interpret,
    )(u_t, v_t, qplanes, ek.folding8_planes_T())


def qplanes_shared(planes):
    """[16, 8*NLIMBS] int8 ctx planes -> the [2*_QROWS, 16] int8 operand for
    the shared-pk MXU gather. Rows 0.._QROWS-1 are the lo-7-bit planes of
    each entry's (ypx, ymx, t2d, z2) limbs, rows _QROWS.. the hi bits —
    matching the per-entry lo/hi row layout _unpack_qt consumes."""
    lo = planes[:, :_QROWS]                          # [16, _QROWS] int8
    hi = planes[:, _QROWS:]
    return jnp.concatenate([lo.T, hi.T], axis=0)     # [2*_QROWS, 16]


def _t_sqrt_ratio(u, v, pad):
    """In-kernel mirror of fe.sqrt_ratio: (sqrt(u/v), ok)."""
    from curve25519_tpu.config import SQRT_M1
    v2 = ft.t_sqr(v)
    v3 = ft.t_mul(v2, v)
    a = ft.t_mul(u, v3)
    b = ft.t_mul(a, ft.t_sqr(v2))
    x = ft.t_mul(ft.t_pow2523(b), a)
    chk = ft.t_sub(ft.t_mul(ft.t_sqr(x), v), u, pad)
    good = ft.t_is_zero(chk)
    m1 = jnp.broadcast_to(ft.t_const(int_to_limbs(SQRT_M1)), x.shape)
    x = ft.t_select(good, x, ft.t_mul(x, m1))
    chk2 = ft.t_sub(ft.t_mul(ft.t_sqr(x), v), u, pad)
    return x, jnp.logical_or(good, ft.t_is_zero(chk2))


def _to_pe(st, pad, two_d):
    """Ext -> PE coords (cf. edwards.to_pe): (Y+X, Y-X, 2d*T, 2Z)."""
    x, y, z, t = st
    return (ft.t_add(y, x), ft.t_sub(y, x, pad),
            ft.t_mul(t, two_d), ft.t_add(z, z))


def _vinit_kernel(y_ref, par_ref, ox_ref, ook_ref):
    """Per-lane Verify_Init: decompress -Q from the pubkey, then build the
    16-entry q_table of subset sums of {-Q, 2^64(-Q), 2^128(-Q), 2^192(-Q)}
    via 192 doublings (reference ed25519_verify.c:179-232)."""
    from curve25519_tpu.config import ED_D, ED_2D
    pad = ft.t_pad()
    y = y_ref[0]
    parity = par_ref[0, 0]
    # `one` enters the doubling loop carry (as Z) — anchor constants to a
    # loaded value so the carry layout is concrete, not replicated
    zero = y - y
    one = zero + ft.t_const(int_to_limbs(1))
    d_c = jnp.broadcast_to(ft.t_const(int_to_limbs(ED_D)), y.shape)
    two_d = jnp.broadcast_to(ft.t_const(int_to_limbs(ED_2D)), y.shape)

    # x from y with inverted parity (ed25519_CalculateX + negate)
    y2 = ft.t_sqr(y)
    u = ft.t_sub(y2, one, pad)
    v = ft.t_add(ft.t_mul(y2, d_c), one)
    x, ok = _t_sqrt_ratio(u, v, pad)
    xc = ft.t_canon(x)
    flip = ((xc[0] ^ parity) & 1) == 1
    x = ft.t_select(flip, ft.t_neg(xc, pad), xc)
    q = (x, y, one, ft.t_mul(x, y))

    two = ft.t_add(one, one)
    qt = [None] * 16
    qt[0] = (one, one, zero, two)
    qt[1] = _to_pe(q, pad, two_d)

    def dbl64(_, st):
        return ek._double(st, pad)

    for base, srcs in ((2, (1,)), (4, (1, 2, 3)),
                       (8, (1, 2, 3, 4, 5, 6, 7))):
        q = jax.lax.fori_loop(0, 64, dbl64, q)
        qt[base] = _to_pe(q, pad, two_d)
        for s in srcs:
            qt[base + s] = _to_pe(ek._add_pe(q, *qt[s], pad), pad, two_d)

    # canonicalize in-kernel: the int8 plane split downstream requires
    # non-negative digits < 2^13, and doing the canon here (t_canon ==
    # fe.canon bit-exact) keeps the [B, 16, 4, NLIMBS] canonicalization off
    # the host-side glue path (it was ~half the verify_init wall-clock)
    ox_ref[0] = jnp.concatenate(
        [ft.t_canon(coord) for e in qt for coord in e],
        axis=0)                                          # [16*_QROWS, S, L]
    ook_ref[0, 0] = ok.astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("interpret",))
def verify_init_tiled(y_t, par_t, interpret=False):
    """y_t: [G, NLIMBS, 8, 128] pubkey y limbs; par_t: [G, 1, 8, 128] int32
    inverted parity bits. Returns (qt_t [G, 16*4*NLIMBS, 8, 128] int32,
    ok_t [G, 1, 8, 128] int32)."""
    g = y_t.shape[0]

    def spec(k):
        return pl.BlockSpec((1, k, ft.TILE_S, ft.TILE_L),
                            lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM)

    return pl.pallas_call(
        _vinit_kernel,
        grid=(g,),
        in_specs=[spec(NLIMBS), spec(1)],
        out_specs=(spec(16 * _QROWS), spec(1)),
        out_shape=(
            jax.ShapeDtypeStruct((g, 16 * _QROWS, ft.TILE_S, ft.TILE_L),
                                 jnp.int32),
            jax.ShapeDtypeStruct((g, 1, ft.TILE_S, ft.TILE_L), jnp.int32)),
        interpret=interpret,
    )(y_t, par_t)


def verify_init_pallas(y_limbs, parity, interpret=False):
    """Batched q_table build. y_limbs: [..., NLIMBS]; parity: [...] int32
    (already inverted for -Q). Any batch shape — leading axes are flattened
    and restored. Returns (qt [..., 16, 4, NLIMBS] int32 CANONICAL limb
    array — ready for the int8 plane split without further reduction,
    ok [...] bool)."""
    from curve25519_tpu.ops.pallas import flatten_batch

    batch = y_limbs.shape[:-1]
    b, unflatten = flatten_batch(batch)
    y_limbs = y_limbs.reshape(b, NLIMBS)
    parity = jnp.broadcast_to(parity, batch).reshape(b)
    bpad = ((b + ft.TILE_BATCH - 1) // ft.TILE_BATCH) * ft.TILE_BATCH
    g = bpad // ft.TILE_BATCH

    def padd(x):
        return jnp.concatenate(
            [x, jnp.zeros((bpad - b, x.shape[-1]), x.dtype)], 0)

    qt_t, ok_t = verify_init_tiled(
        ft.tile_lanes(padd(y_limbs), g),
        ft.tile_lanes(padd(parity.astype(jnp.int32)[:, None]), g),
        interpret=interpret)
    qt = ft.untile_lanes(qt_t)[:b].reshape(b, 16, 4, NLIMBS)
    ok = ft.untile_lanes(ok_t)[:b, 0] != 0
    return unflatten(qt), unflatten(ok)


def _oneshot_kernel(y_ref, par_ref, u_ref, v_ref, planes_ref, orb_ref,
                    ook_ref):
    """Fused one-shot verify: pubkey decompression, the 192-double q_table
    build, AND the s*G + h*(-Q) poly multiply in a single launch. The
    q_table never leaves VMEM — no int8 plane split, no [B, 16, 160] HBM
    round trip, one kernel launch instead of two (the fixed-shape fusion of
    ed25519_VerifySignature, ed25519_verify.c:163-173)."""
    from curve25519_tpu.config import ED_D, ED_2D
    pad = ft.t_pad()
    y = y_ref[0]
    parity = par_ref[0, 0]
    zero = y - y
    one = zero + ft.t_const(int_to_limbs(1))
    d_c = jnp.broadcast_to(ft.t_const(int_to_limbs(ED_D)), y.shape)
    two_d = jnp.broadcast_to(ft.t_const(int_to_limbs(ED_2D)), y.shape)

    # decompress -Q (ed25519_CalculateX + parity flip)
    y2 = ft.t_sqr(y)
    uu = ft.t_sub(y2, one, pad)
    vv = ft.t_add(ft.t_mul(y2, d_c), one)
    x, ok = _t_sqrt_ratio(uu, vv, pad)
    xc = ft.t_canon(x)
    flip = ((xc[0] ^ parity) & 1) == 1
    x = ft.t_select(flip, ft.t_neg(xc, pad), xc)
    q = (x, y, one, ft.t_mul(x, y))

    two = ft.t_add(one, one)
    qt = [None] * 16
    qt[0] = (one, one, zero, two)
    qt[1] = _to_pe(q, pad, two_d)

    def dbl64(_, st):
        return ek._double(st, pad)

    for base, srcs in ((2, (1,)), (4, (1, 2, 3)),
                       (8, (1, 2, 3, 4, 5, 6, 7))):
        q = jax.lax.fori_loop(0, 64, dbl64, q)
        qt[base] = _to_pe(q, pad, two_d)
        for s in srcs:
            qt[base + s] = _to_pe(ek._add_pe(q, *qt[s], pad), pad, two_d)

    entries = [jnp.concatenate(e, axis=0) for e in qt]   # [_QROWS, S, L]

    def gather_qt(idx):
        return _gather_qt(entries, idx)

    planes = planes_ref[...]
    ypx, ymx, t2d, z2 = gather_qt(v_ref[0, 0])
    xx = ft.t_sub(ypx, ymx, pad)
    yy = ft.t_add(ypx, ymx)
    di = jnp.broadcast_to(ft.t_const(int_to_limbs(ED_DI)), t2d.shape)
    st = (xx, yy, z2, ft.t_mul(t2d, di))

    def step1(i, st):
        st = ek._double(st, pad)
        return ek._add_pe(st, *gather_qt(v_ref[0, i]), pad)

    st = jax.lax.fori_loop(1, 32, step1, st)

    def step2(i, st):
        st = ek._double(st, pad)
        st = ek._add_pa(st, *ek._gather_pa(planes, u_ref[0, i - 32]), pad)
        return ek._add_pe(st, *gather_qt(v_ref[0, i]), pad)

    st = jax.lax.fori_loop(32, 64, step2, st)

    xx, yy, zz, _ = st
    zi = ft.t_inv(zz)
    orb_ref[0] = ft.t_pack_point(ft.t_mul(xx, zi), ft.t_mul(yy, zi))
    ook_ref[0, 0] = ok.astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("interpret",))
def verify_oneshot_tiled(y_t, par_t, u_t, v_t, interpret=False):
    """y_t: [G, NLIMBS, 8, 128] pubkey y limbs; par_t: [G, 1, 8, 128]
    inverted parity; u_t: [G, 32, ...] 8-fold digits of s; v_t: [G, 64, ...]
    4-fold digits of h. Returns (enc(R') rows [G, 32, 8, 128] int32,
    ok [G, 1, 8, 128] int32)."""
    g = y_t.shape[0]

    def spec(k):
        return pl.BlockSpec((1, k, ft.TILE_S, ft.TILE_L),
                            lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM)

    planes_spec = pl.BlockSpec((2 * ek._W, 256), lambda i: (0, 0),
                               memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _oneshot_kernel,
        grid=(g,),
        in_specs=[spec(NLIMBS), spec(1), spec(32), spec(64), planes_spec],
        out_specs=(spec(32), spec(1)),
        out_shape=(
            jax.ShapeDtypeStruct((g, 32, ft.TILE_S, ft.TILE_L), jnp.int32),
            jax.ShapeDtypeStruct((g, 1, ft.TILE_S, ft.TILE_L), jnp.int32)),
        interpret=interpret,
    )(y_t, par_t, u_t, v_t, ek.folding8_planes_T())


def verify_oneshot_pallas(y_limbs, parity, u, v, interpret=False):
    """Batched fused one-shot verify. y_limbs: [..., NLIMBS] pubkey y;
    parity: [...] int32 (inverted, for -Q); u: [..., 32]; v: [..., 64].
    Returns (enc(R') bytes [..., 32] uint8, ok [...] bool)."""
    from curve25519_tpu.ops.pallas import flatten_batch

    batch = y_limbs.shape[:-1]
    b, unflatten = flatten_batch(batch)
    y_limbs = y_limbs.reshape(b, NLIMBS)
    parity = jnp.broadcast_to(parity, batch).reshape(b)
    u = jnp.broadcast_to(u, batch + (32,)).reshape(b, 32)
    v = jnp.broadcast_to(v, batch + (64,)).reshape(b, 64)
    bpad = ((b + ft.TILE_BATCH - 1) // ft.TILE_BATCH) * ft.TILE_BATCH
    g = bpad // ft.TILE_BATCH

    def padd(x):
        return jnp.concatenate(
            [x, jnp.zeros((bpad - b, x.shape[-1]), x.dtype)], 0)

    r_t, ok_t = verify_oneshot_tiled(
        ft.tile_lanes(padd(y_limbs), g),
        ft.tile_lanes(padd(parity.astype(jnp.int32)[:, None]), g),
        ft.tile_lanes(padd(u), g), ft.tile_lanes(padd(v), g),
        interpret=interpret)
    r = ft.untile_lanes(r_t)[:b].astype(jnp.uint8)
    ok = ft.untile_lanes(ok_t)[:b, 0] != 0
    return unflatten(r), unflatten(ok)


def poly_mult_pallas(u, v, planes, interpret=False):
    """Batched enc(s*G + h*(-Q)) via the Pallas kernel.

    u: [..., 32] 8-fold digits of s (fold.cut8_*); v: [..., 64] 4-fold
    digits of h (fold.cut4_*); planes: [..., 16, 8*NLIMBS] int8 — the
    Verify_Init context's plane-split q_table (models/ed25519.verify_init).
    Any batch shape — leading axes are flattened and restored. An *unbatched*
    planes array (ndim == 2: one pk shared by the whole batch) routes to the
    shared-operand kernel, which ships the q_table once as an int8 MXU operand
    instead of 2.5 KB per lane. Returns enc(R') bytes [..., 32] uint8 (canon
    + point compression run in-kernel)."""
    from curve25519_tpu.ops.pallas import flatten_batch

    batch = u.shape[:-1]
    b, unflatten = flatten_batch(batch)
    u = u.reshape(b, 32)
    v = jnp.broadcast_to(v, batch + (64,)).reshape(b, 64)
    shared = planes.ndim == 2        # one pk for the whole batch
    if not shared:
        planes = jnp.broadcast_to(
            planes,
            batch + planes.shape[-2:]).reshape((b,) + planes.shape[-2:])
    bpad = ((b + ft.TILE_BATCH - 1) // ft.TILE_BATCH) * ft.TILE_BATCH
    g = bpad // ft.TILE_BATCH

    def padd(x):
        return jnp.concatenate(
            [x, jnp.zeros((bpad - b, x.shape[-1]), x.dtype)], 0)

    if shared:
        r_t = poly_mult_tiled_shared(
            ft.tile_lanes(padd(u), g), ft.tile_lanes(padd(v), g),
            qplanes_shared(planes), interpret=interpret)
    else:
        # ship the planes as int8 end-to-end (entry-major [B, 16*160]); the
        # kernel unpacks them in VMEM, halving the q_table HBM traffic
        qt8 = planes.reshape(b, 16 * 8 * NLIMBS)
        r_t = poly_mult_tiled(
            ft.tile_lanes(padd(u), g), ft.tile_lanes(padd(v), g),
            ft.tile_lanes(padd(qt8), g), interpret=interpret)
    return unflatten(ft.untile_lanes(r_t)[:b].astype(jnp.uint8))
