"""Pallas FOLDING-8 Edwards base-point-multiply kernel.

One kernel launch runs the whole folding multiply — 31 x (extended-coord
double + constant-time table add) — plus the final field inversion, for
TILE_BATCH = 1024 lanes per grid block, all state resident in VMEM as
[NLIMBS, 8, 128] tiles (same layout and carry scheme as ladder_kernel.py).

This is the hot path of Ed25519 keygen, the R = r*G half of sign, and the
folding-accelerated X25519 public-key derivation (reference
edp_BasePointMult, source/ed25519_sign.c:215-244, and
x25519_BasePointMultiply, source/curve25519_dh.c:162-179).

The secret-indexed 256-entry table lookup — the reference's acknowledged
constant-time gap (a data-dependent load, SURVEY.md §3.2) — becomes a
one-hot int8 matmul on the MXU: the table's weak-all limbs are split into
two 7-bit planes (values <= 127, exact in int8), laid out as a [2*W, 256]
operand, and each fold step contracts it with the per-lane one-hot
[256, 1024] matrix. The MXU does the gather while the VPU does the field
arithmetic; secrets never index memory.

Epilogues (static `mode`):
- "affine":  returns (X/Z, Y/Z) limbs     — tests / composition
- "mont_u":  returns u = (Z+Y)/(Z-Y)      — X25519 CalculatePublicKey_fast
             (birational map, curve25519_dh.c:174-178)
- "pk":      returns the COMPRESSED POINT BYTES (enc(Y/Z), parity bit) —
             Ed25519 keygen / sign-R; canon + pack run in-kernel so no
             [B, 20] limb epilogue crosses the kernel boundary
- "u_bytes": returns enc(u) bytes          — X25519 fast pubkey end-to-end
An optional blinding epilogue adds a per-lane PE point BP, completing
(a + bl)*G + BP (reference edp_BasePointMultiply, ed25519_sign.c:246-268).
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from curve25519_tpu.config import ED_DI, NLIMBS, int_to_limbs
from curve25519_tpu.ops.pallas import fe_tile as ft

__all__ = ["base_mult_tiled", "base_mult_pallas", "folding8_planes_T",
           "folding_planes_T"]

_W = 64          # 3 coords x 20 limbs = 60, padded to 64 matmul columns
_CUTS = 32


@functools.lru_cache(maxsize=None)
def _planes_T_np(nfolds):
    """[2*_W, 2^nfolds] int8: the folding table, 7-bit plane-split and
    transposed for the in-kernel one-hot matmul. Row r < _W = lo 7 bits of
    flattened limb r (coords ypx/ymx/t2d, 20 limbs each); row _W + r = high
    bits. nfolds=8 -> the 256-entry table, nfolds=4 -> the 16-entry one
    (reference base_folding8.h / pre_compute_base_folding4)."""
    from curve25519_tpu.models import tables
    nent = 1 << nfolds
    t = (tables.folding8_table() if nfolds == 8
         else tables.folding4_table())
    t = np.asarray(t).reshape(nent, 3 * NLIMBS)
    padded = np.zeros((nent, _W), np.int32)
    padded[:, :3 * NLIMBS] = t
    planes = np.concatenate([padded & 0x7F, padded >> 7], axis=1)
    return planes.T.astype(np.int8)


def folding_planes_T(nfolds=8):
    return jnp.asarray(_planes_T_np(nfolds), jnp.int8)


def folding8_planes_T():
    return folding_planes_T(8)


def _gather_pa(planes, idx):
    """Constant-time table fetch for all 1024 lanes of one tile.

    planes: [2*_W, nent] int8; idx: [8, 128] int32 in [0, nent).
    Returns (ypx, ymx, t2d) limb tiles [NLIMBS, 8, 128] int32. Exact: 7-bit
    plane values and one-hot entries both fit int8, and the MXU accumulates
    int8 x int8 into int32 directly — no float conversion on either
    operand (measured slightly faster than the bf16 form, and half the
    VMEM for the table)."""
    nent = planes.shape[-1]
    iota = jax.lax.broadcasted_iota(jnp.int32, (nent, ft.TILE_S, ft.TILE_L), 0)
    oh = (iota == idx[None]).astype(jnp.int8)
    oh = oh.reshape(nent, ft.TILE_BATCH)                      # [nent, 1024]
    vals = jax.lax.dot(planes, oh,
                       preferred_element_type=jnp.int32)      # [128, 1024]
    vals = vals.reshape(2 * _W, ft.TILE_S, ft.TILE_L)
    limbs = vals[:_W] + (vals[_W:] << 7)
    return (limbs[:NLIMBS], limbs[NLIMBS:2 * NLIMBS],
            limbs[2 * NLIMBS:3 * NLIMBS])


def _double(st, pad):
    """Extended-coord doubling, 4M+4S (reference edp_DoublePoint,
    ed25519_sign.c:122-143), on [NLIMBS, 8, 128] tiles."""
    x, y, z, t = st
    a = ft.t_sqr(x)
    b = ft.t_sqr(y)
    c = ft.t_sqr(z)
    c = ft.t_add(c, c)
    d = ft.t_neg(a, pad)
    h = ft.t_sub(d, b, pad)
    g = ft.t_add(d, b)
    f = ft.t_sub(g, c, pad)
    e = ft.t_add(ft.t_sqr(ft.t_add(x, y)), h)
    return (ft.t_mul(e, f), ft.t_mul(h, g), ft.t_mul(g, f), ft.t_mul(e, h))


def _add_pa(st, ypx, ymx, t2d, pad):
    """st + affine precomputed point, 7M (reference edp_AddAffinePoint,
    ed25519_sign.c:97-115)."""
    x, y, z, t = st
    a = ft.t_mul(ft.t_sub(y, x, pad), ymx)
    b = ft.t_mul(ft.t_add(y, x), ypx)
    c = ft.t_mul(t, t2d)
    d = ft.t_add(z, z)
    e = ft.t_sub(b, a, pad)
    h = ft.t_add(b, a)
    f = ft.t_sub(d, c, pad)
    g = ft.t_add(d, c)
    return (ft.t_mul(e, f), ft.t_mul(h, g), ft.t_mul(g, f), ft.t_mul(e, h))


def _add_pe(st, ypx, ymx, t2d, z2, pad):
    """st + PE point, 8M (reference edp_AddPoint, ed25519_verify.c:142-161)."""
    x, y, z, t = st
    a = ft.t_mul(ft.t_sub(y, x, pad), ymx)
    b = ft.t_mul(ft.t_add(y, x), ypx)
    c = ft.t_mul(t, t2d)
    d = ft.t_mul(z, z2)
    e = ft.t_sub(b, a, pad)
    h = ft.t_add(b, a)
    f = ft.t_sub(d, c, pad)
    g = ft.t_add(d, c)
    return (ft.t_mul(e, f), ft.t_mul(h, g), ft.t_mul(g, f), ft.t_mul(e, h))


def _basemult_kernel(cut_ref, zr_ref, planes_ref, *rest, mode, use_bp,
                     ncuts=_CUTS):
    if use_bp:
        bp_ref, *out_refs = rest
    else:
        out_refs = list(rest)
    pad = ft.t_pad()
    planes = planes_ref[...]
    zr = zr_ref[0]

    # init from table entry cut[0] with the randomized projective start
    # (2xR : 2yR : 2R : 2xyR), reference ed25519_sign.c:226-237
    ypx, ymx, t2d = _gather_pa(planes, cut_ref[0, 0])
    x2 = ft.t_sub(ypx, ymx, pad)                      # 2x
    y2 = ft.t_add(ypx, ymx)                           # 2y
    di = jnp.broadcast_to(ft.t_const(int_to_limbs(ED_DI)), t2d.shape)
    t2 = ft.t_mul(t2d, di)                            # 2xy = t2d / d
    st = (ft.t_mul(x2, zr), ft.t_mul(y2, zr),
          ft.t_add(zr, zr), ft.t_mul(t2, zr))

    def step(i, st):
        st = _double(st, pad)
        ypx, ymx, t2d = _gather_pa(planes, cut_ref[0, i])
        return _add_pa(st, ypx, ymx, t2d, pad)

    st = jax.lax.fori_loop(1, ncuts, step, st)

    if use_bp:
        bp = bp_ref[0]
        st = _add_pe(st, bp[0], bp[1], bp[2], bp[3], pad)

    x, y, z, _ = st
    if mode in ("affine", "pk"):
        zi = ft.t_inv(z)
        ax = ft.t_mul(x, zi)
        ay = ft.t_mul(y, zi)
        if mode == "affine":
            out_refs[0][0] = ax
            out_refs[1][0] = ay
        else:
            out_refs[0][0] = ft.t_pack_point(ax, ay)
    else:  # mont_u / u_bytes: u = (Z+Y)/(Z-Y)
        u = ft.t_mul(ft.t_add(z, y), ft.t_inv(ft.t_sub(z, y, pad)))
        if mode == "mont_u":
            out_refs[0][0] = u
            out_refs[1][0] = u
        else:
            out_refs[0][0] = ft.t_to_bytes(u)


@functools.partial(jax.jit, static_argnames=("mode", "interpret", "nfolds"))
def base_mult_tiled(cut_t, zr_t, bp_t=None, mode="affine", interpret=False,
                    nfolds=8):
    """cut_t: [G, ncuts, 8, 128] fold digits (ncuts = 256 // nfolds);
    zr_t: [G, NLIMBS, 8, 128]; bp_t: optional [G, 4, NLIMBS, 8, 128] PE
    blinding point. nfolds selects the 8-fold (256-entry table, 32 steps) or
    4-fold (16-entry table, 64 steps) variant — the reference's
    memory/speed-tradeoff pair (source/curve25519_utils.c:125-153).
    Returns (x_t, y_t) limb tensors in the same tiling ("mont_u": both = u);
    the byte modes ("pk"/"u_bytes") return ONE [G, 32, 8, 128] int32 tensor
    of encoded byte rows."""
    g = cut_t.shape[0]
    ncuts = 256 // nfolds
    nent = 1 << nfolds

    def spec(k):
        return pl.BlockSpec((1, k, ft.TILE_S, ft.TILE_L),
                            lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM)

    planes_spec = pl.BlockSpec((2 * _W, nent), lambda i: (0, 0),
                               memory_space=pltpu.VMEM)
    bp_spec = pl.BlockSpec((1, 4, NLIMBS, ft.TILE_S, ft.TILE_L),
                           lambda i: (i, 0, 0, 0, 0), memory_space=pltpu.VMEM)
    lim_shape = jax.ShapeDtypeStruct((g, NLIMBS, ft.TILE_S, ft.TILE_L),
                                     jnp.int32)
    if mode in ("pk", "u_bytes"):
        out_specs = spec(32)
        out_shape = jax.ShapeDtypeStruct((g, 32, ft.TILE_S, ft.TILE_L),
                                         jnp.int32)
    else:
        out_specs = (spec(NLIMBS), spec(NLIMBS))
        out_shape = (lim_shape, lim_shape)
    use_bp = bp_t is not None
    in_specs = [spec(ncuts), spec(NLIMBS), planes_spec]
    args = [cut_t, zr_t, folding_planes_T(nfolds)]
    if use_bp:
        in_specs.append(bp_spec)
        args.append(bp_t)
    return pl.pallas_call(
        functools.partial(_basemult_kernel, mode=mode, use_bp=use_bp,
                          ncuts=ncuts),
        grid=(g,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )(*args)


def base_mult_pallas(cut, zr=None, bp=None, mode="affine", interpret=False,
                     nfolds=8):
    """Batched folding base-point multiply via the Pallas kernel.

    cut: [..., 256 // nfolds] fold digits (fold.cut8_* for nfolds=8,
    fold.cut4_* for nfolds=4 — extracted straight from the scalar's byte or
    limb encoding, no bit-tensor intermediate; any batch shape — leading
    axes are flattened and restored); zr: optional [..., NLIMBS] or [NLIMBS]
    projective randomizer; bp: optional PE point dict to add (blinding).
    Pads the flat batch to a multiple of TILE_BATCH internally (pad lanes
    cut to the identity). Returns (x, y) affine limb tensors [..., NLIMBS],
    (u, u) for mode="mont_u", or [..., 32] uint8 encodings for the byte
    modes ("pk" = compressed point, "u_bytes" = enc(u)). Semantics match
    edwards.base_point_mult / base_point_mult_fold4 composed with
    to_affine / _pack / the birational map."""
    from curve25519_tpu.ops import fe
    from curve25519_tpu.ops.pallas import flatten_batch

    ncuts = 256 // nfolds
    batch = cut.shape[:-1]
    b, unflatten = flatten_batch(batch)
    cut = cut.reshape(b, ncuts)
    if zr is not None:
        zr = jnp.broadcast_to(zr, batch + (NLIMBS,)).reshape(b, NLIMBS)
    if bp is not None:
        bp = {k: jnp.broadcast_to(v, batch + (NLIMBS,)).reshape(b, NLIMBS)
              for k, v in bp.items()}
    bpad = ((b + ft.TILE_BATCH - 1) // ft.TILE_BATCH) * ft.TILE_BATCH
    g = bpad // ft.TILE_BATCH

    cut = jnp.concatenate(
        [cut, jnp.zeros((bpad - b, ncuts), jnp.int32)], 0)

    if zr is None:
        zr_l = fe.one((bpad,))
    else:
        zr_l = jnp.concatenate(
            [zr, jnp.broadcast_to(fe.one(()), (bpad - b, NLIMBS))], 0)

    bp_t = None
    if bp is not None:
        coords = jnp.stack([jnp.broadcast_to(bp[k], (b, NLIMBS))
                            for k in ("ypx", "ymx", "t2d", "z2")], 1)
        ident = jnp.stack([fe.one(()), fe.one(()), fe.zero(()),
                           fe.from_int(2)], 0)
        coords = jnp.concatenate(
            [coords, jnp.broadcast_to(ident, (bpad - b, 4, NLIMBS))], 0)
        bp_t = coords.reshape(g, ft.TILE_S, ft.TILE_L, 4, NLIMBS)
        bp_t = bp_t.transpose(0, 3, 4, 1, 2)

    out = base_mult_tiled(
        ft.tile_lanes(cut, g), ft.tile_lanes(zr_l, g), bp_t,
        mode=mode, interpret=interpret, nfolds=nfolds)
    if mode in ("pk", "u_bytes"):
        by = ft.untile_lanes(out)[:b].astype(jnp.uint8)
        return unflatten(by)
    x_t, y_t = out
    return (unflatten(ft.untile_lanes(x_t)[:b]),
            unflatten(ft.untile_lanes(y_t)[:b]))
