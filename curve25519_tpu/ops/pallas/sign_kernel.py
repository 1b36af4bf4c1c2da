"""Fused one-launch Ed25519 keygen and sign kernels.

Round-4 closed the inter-kernel glue of the sign path to ~14% of device
time; this closes the rest by running the ENTIRE protocol in one Pallas
launch per 1024-lane tile, the same treatment verify got in
verify_kernel._oneshot_kernel:

  keygen:  SHA512(seed) -> clamp -> 8-fold cut -> folding base mult
           -> compressed pubkey bytes                (ed25519_sign.c:344-367)
  sign:    SHA512(seed) -> clamp ->
           r = SHA512(prefix || msg) mod l ->
           R = r*G (folding base mult) ->
           h = SHA512(enc(R) || pk || msg) mod l ->
           S = h*a + r mod l -> (R, S) signature bytes
                                                    (ed25519_sign.c:372-419)

Nothing but padded message words and byte strings crosses the kernel
boundary: digest reduction mod l, fold-digit extraction, and the final
S = h*a + r all run on VMEM-resident tiles (ops/pallas/sc_tile.py), and
the three SHA-512 compressions reuse the unrolled round logic of
sha512_kernel. The SHA prefixes that depend on in-kernel values (the
secret prefix half of SHA512(seed); enc(R) and the pubkey) are spliced
into block 0's word reads: the host packs each message with a word-aligned
zero "hole" at the front (FIPS padding depends only on the total length)
and the kernel substitutes the first 8/16 half-word rows.

Fold digits for the in-kernel scalar r land in a VMEM scratch buffer so
the base-mult loop can index them dynamically (dynamic indexing works on
refs, not values).

Batched messages up to MAX_FUSED_BLOCKS SHA blocks take this path; longer
messages fall back to the multi-launch composition (models/ed25519.py),
which streams blocks in bounded chunks.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from curve25519_tpu.config import NLIMBS
from curve25519_tpu.ops import sha512 as sha_jnp
from curve25519_tpu.ops.pallas import edwards_kernel as ek
from curve25519_tpu.ops.pallas import fe_tile as ft
from curve25519_tpu.ops.pallas import sc_tile as sct
from curve25519_tpu.ops.pallas import sha512_kernel as shk

__all__ = ["keygen_fused_pallas", "sign_fused_pallas", "MAX_FUSED_BLOCKS",
           "max_fused_msg_len"]

# Longest message (in SHA blocks, including the 64-byte spliced prefix of
# the h hash) kept fully VMEM-resident by the fused kernel. 8 blocks =
# 1 KiB of message words per lane (~4 MiB for 8 tiles of pipeline
# lookahead) — comfortably inside VMEM; longer batches use the chunked
# streaming SHA kernel instead.
MAX_FUSED_BLOCKS = 8

_H0 = [int(v) for v in np.asarray(sha_jnp._H0_HL).reshape(16)]


def max_fused_msg_len(msg_max_len):
    """True when [.., msg_max_len] messages fit the fused-kernel block cap."""
    return sha_jnp._nblocks_static(msg_max_len + 64) <= MAX_FUSED_BLOCKS


def _compress_block(wpairs, st, unroll, k_ref):
    """One SHA-512 compression over 16 in-register message words.

    wpairs: list of 16 (hi, lo) u32 tiles; st: 16-tuple state. Returns the
    raw compression output (caller adds it into the state). `unroll=True`
    emits all 80 rounds with K as vector immediates (the fast Mosaic form);
    otherwise the first 16 rounds unroll (the schedule reads are static)
    and rounds 16..80 roll with the 16-word window as a loop carry and K
    from SMEM — the form XLA's interpreter can compile in reasonable time.
    """
    if unroll:
        w = list(wpairs)
        v = st
        for t in range(80):
            if t < 16:
                wh, wl = w[t]
            else:
                s1 = shk._sigma1(*w[(t - 2) % 16])
                s0 = shk._sigma0(*w[(t - 15) % 16])
                acc = shk._add64(*s1, *w[(t - 7) % 16])
                acc = shk._add64(*acc, *s0)
                wh, wl = shk._add64(*acc, *w[t % 16])
                w[t % 16] = (wh, wl)
            v = shk._round(v, wh, wl, jnp.uint32(sha_jnp._K[t] >> 32),
                           jnp.uint32(sha_jnp._K[t] & 0xFFFFFFFF))
        return v

    v = st
    for t in range(16):
        v = shk._round(v, *wpairs[t], k_ref[t, 0], k_ref[t, 1])
    win = tuple(h for pair in wpairs for h in pair)      # 32 half rows

    def recur(t, carry):
        vv, win = carry
        s1 = shk._sigma1(win[28], win[29])               # w[t-2]
        s0 = shk._sigma0(win[2], win[3])                 # w[t-15]
        w = shk._add64(*shk._add64(*s1, win[18], win[19]),
                       *shk._add64(*s0, win[0], win[1]))
        vv = shk._round(vv, w[0], w[1], k_ref[t, 0], k_ref[t, 1])
        return vv, win[2:] + w

    v, _ = jax.lax.fori_loop(16, 80, recur, (v, win))
    return v


def _add_state(st, v, active=None):
    """state += compression output; lanes past their block count keep the
    old state (same masking as sha512_kernel's block_step)."""
    new = []
    for i in range(8):
        nh, nl = shk._add64(st[2 * i], st[2 * i + 1], v[2 * i], v[2 * i + 1])
        new.extend((nh, nl))
    if active is None:
        return tuple(new)
    return tuple(jnp.where(active, n, o) for n, o in zip(new, st))


def _sha_over_ref(w_ref, nb_static, nb_lane, h0, splice, unroll, k_ref):
    """SHA-512 over a padded word ref ([1, nb_static*32, S, L] u32 block in
    (block, word, hi/lo) row order) with per-lane active block count
    nb_lane. Block 0 is peeled so the `splice` dict {half-row index: u32
    tile} can substitute the prefix hole statically (every message is at
    least as long as its prefix, so block 0 is always active and the
    padding marker never lands inside the hole); later blocks read the ref
    with a traced row index (dynamic indexing works on refs)."""
    w0 = []
    for t in range(16):
        hi = w_ref[0, 2 * t]
        lo = w_ref[0, 2 * t + 1]
        if splice:
            hi = splice.get(2 * t, hi)
            lo = splice.get(2 * t + 1, lo)
        w0.append((hi, lo))
    st = _add_state(h0, _compress_block(w0, h0, unroll, k_ref))
    if nb_static > 1:
        def body(b, st):
            wp = [(w_ref[0, b * 32 + 2 * t], w_ref[0, b * 32 + 2 * t + 1])
                  for t in range(16)]
            v = _compress_block(wp, st, unroll, k_ref)
            return _add_state(st, v, b < nb_lane)

        st = jax.lax.fori_loop(1, nb_static, body, st)
    return st


def _base_mult_from_scratch(cut_ref, zr, planes, pad, bp=None):
    """Folding-8 base multiply whose digits live in a VMEM scratch ref
    (written by the caller from in-kernel values). Same randomized start +
    31x(double + table add) as edwards_kernel._basemult_kernel. `bp` is an
    optional [4*NLIMBS, S, L] PE blinding point added before normalization
    — the + BP of (a + bl)*G + BP (reference edp_BasePointMultiply,
    ed25519_sign.c:246-268)."""
    from curve25519_tpu.config import ED_DI, int_to_limbs
    ypx, ymx, t2d = ek._gather_pa(planes, cut_ref[0])
    x2 = ft.t_sub(ypx, ymx, pad)
    y2 = ft.t_add(ypx, ymx)
    di = jnp.broadcast_to(ft.t_const(int_to_limbs(ED_DI)), t2d.shape)
    t2 = ft.t_mul(t2d, di)
    st = (ft.t_mul(x2, zr), ft.t_mul(y2, zr),
          ft.t_add(zr, zr), ft.t_mul(t2, zr))

    def step(i, st):
        st = ek._double(st, pad)
        return ek._add_pa(st, *ek._gather_pa(planes, cut_ref[i]), pad)

    st = jax.lax.fori_loop(1, 32, step, st)
    if bp is not None:
        st = ek._add_pe(st, bp[:NLIMBS], bp[NLIMBS:2 * NLIMBS],
                        bp[2 * NLIMBS:3 * NLIMBS], bp[3 * NLIMBS:], pad)
    x, y, z, _ = st
    zi = ft.t_inv(z)
    return ft.t_pack_point(ft.t_mul(x, zi), ft.t_mul(y, zi))   # [32, S, L]


def _keygen_kernel(skw_ref, zr_ref, planes_ref, k_ref, *rest, use_bl,
                   unroll):
    if use_bl:
        bl_ref, bp_ref, pk_ref, cut_ref = rest
    else:
        pk_ref, cut_ref = rest
    pad = ft.t_pad()
    planes = planes_ref[...]
    zero_u = skw_ref[0, 0] ^ skw_ref[0, 0]
    h0 = tuple(zero_u + jnp.uint32(_H0[i]) for i in range(16))

    # md = SHA512(seed): one statically-padded block
    w1 = [(skw_ref[0, 2 * t], skw_ref[0, 2 * t + 1]) for t in range(16)]
    st1 = _add_state(h0, _compress_block(w1, h0, unroll, k_ref))
    md_by = sct.bytes_from_halves(jnp.stack(st1, axis=0))      # [64, S, L]

    a_by = sct.clamp_rows(md_by[:32])
    a = sct.limbs_from_byte_rows(a_by)
    bp = None
    if use_bl:
        # blinded route: (a + bl)*G + BP  (ed25519_sign.c:254-258)
        a = sct.sc_add(sct.sc_mod(a), bl_ref[0])
        bp = bp_ref[0]
    digs = sct.cut8_rows(a)
    for c in range(32):
        cut_ref[c] = digs[c]

    pk_ref[0] = _base_mult_from_scratch(cut_ref, zr_ref[0], planes, pad,
                                        bp=bp)


def _sign_kernel(skw_ref, pkw_ref, w2_ref, nb2_ref, w3_ref, nb3_ref, zr_ref,
                 planes_ref, k_ref, *rest, nb2, nb3, use_bl, unroll):
    if use_bl:
        bl_ref, bp_ref, sig_ref, cut_ref = rest
    else:
        sig_ref, cut_ref = rest
    pad = ft.t_pad()
    planes = planes_ref[...]
    zero_u = skw_ref[0, 0] ^ skw_ref[0, 0]
    h0 = tuple(zero_u + jnp.uint32(_H0[i]) for i in range(16))

    # md = SHA512(seed) -> a (clamped low half), prefix (high half)
    w1 = [(skw_ref[0, 2 * t], skw_ref[0, 2 * t + 1]) for t in range(16)]
    st1 = _add_state(h0, _compress_block(w1, h0, unroll, k_ref))
    md_by = sct.bytes_from_halves(jnp.stack(st1, axis=0))
    a = sct.limbs_from_byte_rows(sct.clamp_rows(md_by[:32]))
    # prefix bytes 32..63 of md == state half rows 8..15 (BE pack), spliced
    # directly into the r-hash's 32-byte hole
    st2 = _sha_over_ref(w2_ref, nb2, nb2_ref[0, 0], h0,
                        {i: st1[8 + i] for i in range(8)}, unroll, k_ref)
    r = sct.sc_from_digest_rows(sct.bytes_from_halves(jnp.stack(st2, 0)))

    # blinded route multiplies t = r + bl and adds BP after the loop
    # (r is canonical, so sc.mod(r) of the jnp twin is the identity)
    t_scalar = sct.sc_add(r, bl_ref[0]) if use_bl else r
    bp = bp_ref[0] if use_bl else None
    digs = sct.cut8_rows(t_scalar)               # canonical/normalized
    for c in range(32):
        cut_ref[c] = digs[c]
    r_rows = _base_mult_from_scratch(cut_ref, zr_ref[0], planes, pad,
                                     bp=bp)

    # h = SHA512(enc(R) || pk || msg) mod l: splice the 64-byte hole with
    # the in-kernel enc(R) and the host-packed pubkey halves
    spl = {i: v for i, v in enumerate(sct.halves_from_byte_rows(r_rows))}
    for i in range(8):
        spl[8 + i] = pkw_ref[0, i]
    st3 = _sha_over_ref(w3_ref, nb3, nb3_ref[0, 0], h0, spl, unroll, k_ref)
    h = sct.sc_from_digest_rows(sct.bytes_from_halves(jnp.stack(st3, 0)))

    # S = h*a + r mod l, emitted as canonical bytes
    s = sct.sc_muladd(h, sct.sc_mod(a), r)
    sig_ref[0] = jnp.concatenate([r_rows, ft.t_norm_to_bytes(s)], axis=0)


@functools.partial(jax.jit, static_argnames=("interpret",))
def keygen_tiled(skw_t, zr_t, bl_t=None, bp_t=None, interpret=False):
    """skw_t: [G, 32, 8, 128] u32 padded words of SHA512(seed);
    zr_t: [G, NLIMBS, 8, 128] projective randomizer; bl_t/bp_t: optional
    [G, NLIMBS, ...] blinder scalar and [G, 4*NLIMBS, ...] PE blinding
    point (both or neither). Returns compressed pubkey byte rows
    [G, 32, 8, 128] int32."""
    g = skw_t.shape[0]
    use_bl = bl_t is not None

    def spec(k):
        return pl.BlockSpec((1, k, ft.TILE_S, ft.TILE_L),
                            lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM)

    planes_spec = pl.BlockSpec((2 * ek._W, 256), lambda i: (0, 0),
                               memory_space=pltpu.VMEM)
    in_specs = [spec(32), spec(NLIMBS), planes_spec,
                pl.BlockSpec(memory_space=pltpu.SMEM)]
    args = [skw_t, zr_t, ek.folding8_planes_T(),
            jnp.asarray(sha_jnp._K_HL)]
    if use_bl:
        in_specs += [spec(NLIMBS), spec(4 * NLIMBS)]
        args += [bl_t, bp_t]
    return pl.pallas_call(
        functools.partial(_keygen_kernel, use_bl=use_bl,
                          unroll=not interpret),
        grid=(g,),
        in_specs=in_specs,
        out_specs=spec(32),
        out_shape=jax.ShapeDtypeStruct((g, 32, ft.TILE_S, ft.TILE_L),
                                       jnp.int32),
        scratch_shapes=[pltpu.VMEM((32, ft.TILE_S, ft.TILE_L), jnp.int32)],
        interpret=interpret,
    )(*args)


@functools.partial(jax.jit, static_argnames=("nb2", "nb3", "interpret"))
def sign_tiled(skw_t, pkw_t, w2_t, nb2_t, w3_t, nb3_t, zr_t, nb2, nb3,
               bl_t=None, bp_t=None, interpret=False):
    """One-launch sign. skw_t: [G, 32, ...] u32 seed-hash block; pkw_t:
    [G, 8, ...] u32 pubkey halves; w2_t/w3_t: [G, nb*32, ...] u32 padded
    words of (32/64-byte hole || msg); nb2_t/nb3_t: [G, 1, ...] int32
    per-lane block counts; zr_t: [G, NLIMBS, ...] randomizer; bl_t/bp_t:
    optional blinder scalar + PE blinding point. Returns signature byte
    rows [G, 64, 8, 128] int32."""
    g = skw_t.shape[0]
    use_bl = bl_t is not None

    def spec(k):
        return pl.BlockSpec((1, k, ft.TILE_S, ft.TILE_L),
                            lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM)

    planes_spec = pl.BlockSpec((2 * ek._W, 256), lambda i: (0, 0),
                               memory_space=pltpu.VMEM)
    in_specs = [spec(32), spec(8), spec(nb2 * 32), spec(1), spec(nb3 * 32),
                spec(1), spec(NLIMBS), planes_spec,
                pl.BlockSpec(memory_space=pltpu.SMEM)]
    args = [skw_t, pkw_t, w2_t, nb2_t, w3_t, nb3_t, zr_t,
            ek.folding8_planes_T(), jnp.asarray(sha_jnp._K_HL)]
    if use_bl:
        in_specs += [spec(NLIMBS), spec(4 * NLIMBS)]
        args += [bl_t, bp_t]
    return pl.pallas_call(
        functools.partial(_sign_kernel, nb2=nb2, nb3=nb3, use_bl=use_bl,
                          unroll=not interpret),
        grid=(g,),
        in_specs=in_specs,
        out_specs=spec(64),
        out_shape=jax.ShapeDtypeStruct((g, 64, ft.TILE_S, ft.TILE_L),
                                       jnp.int32),
        scratch_shapes=[pltpu.VMEM((32, ft.TILE_S, ft.TILE_L), jnp.int32)],
        interpret=interpret,
    )(*args)


def _flat_pad(x, bpad, dtype=None):
    b = x.shape[0]
    if bpad == b:
        return x
    return jnp.concatenate(
        [x, jnp.zeros((bpad - b,) + x.shape[1:], x.dtype)], 0)


def _prep_zr(zr, batch, b, bpad):
    from curve25519_tpu.ops import fe
    if zr is None:
        zr_l = fe.one((bpad,))
    else:
        zr = jnp.broadcast_to(zr, batch + (NLIMBS,)).reshape(b, NLIMBS)
        zr_l = jnp.concatenate(
            [zr, jnp.broadcast_to(fe.one(()), (bpad - b, NLIMBS))], 0)
    return zr_l


def _prep_blinding(bl, bp, batch, b, bpad, g):
    """Broadcast + pad the blinder scalar and PE point to tile form.
    Pad lanes get bl = 0 and BP = the PE identity (1, 1, 0, 2), keeping
    them on the unblinded semantics."""
    from curve25519_tpu.ops import fe
    if bl is None:
        return None, None
    bl = jnp.broadcast_to(bl, batch + (NLIMBS,)).reshape(b, NLIMBS)
    bl = jnp.concatenate([bl, jnp.zeros((bpad - b, NLIMBS), bl.dtype)], 0)
    coords = jnp.concatenate(
        [jnp.broadcast_to(bp[k], batch + (NLIMBS,)).reshape(b, NLIMBS)
         for k in ("ypx", "ymx", "t2d", "z2")], axis=-1)     # [b, 4*NLIMBS]
    ident = jnp.concatenate([fe.one(()), fe.one(()), fe.zero(()),
                             fe.from_int(2)], 0)
    coords = jnp.concatenate(
        [coords, jnp.broadcast_to(ident, (bpad - b, 4 * NLIMBS))], 0)
    return ft.tile_lanes(bl, g), ft.tile_lanes(coords, g)


def keygen_fused_pallas(sk, zr=None, bl=None, bp=None, interpret=False):
    """Batched fused keygen: [..., 32] uint8 seeds -> [..., 32] uint8
    compressed pubkeys in one kernel launch (SHA + clamp + cut + base
    mult + pack; with bl/bp, the blinded (a + bl)*G + BP form).
    Bit-identical to the multi-launch composition sha512 -> clamp ->
    _base_mult_pk (models/ed25519.create_keypair)."""
    from curve25519_tpu.ops.pallas import flatten_batch

    sk = jnp.asarray(sk, jnp.uint8)
    batch = sk.shape[:-1]
    b, unflatten = flatten_batch(batch)
    sk = sk.reshape(b, 32)
    words, _, _ = shk._pack_words(sk, jnp.full((b,), 32, jnp.int32))
    bpad = ((b + ft.TILE_BATCH - 1) // ft.TILE_BATCH) * ft.TILE_BATCH
    g = bpad // ft.TILE_BATCH
    bl_t, bp_t = _prep_blinding(bl, bp, batch, b, bpad, g)
    pk_t = keygen_tiled(
        ft.tile_lanes(_flat_pad(words, bpad), g),
        ft.tile_lanes(_prep_zr(zr, batch, b, bpad), g),
        bl_t, bp_t, interpret=interpret)
    return unflatten(ft.untile_lanes(pk_t)[:b].astype(jnp.uint8))


def sign_fused_pallas(priv, msg, msg_len=None, zr=None, bl=None, bp=None,
                      interpret=False):
    """Batched fused sign: priv [..., 64] (seed || pk), msg [..., L] uint8
    (L within max_fused_msg_len), msg_len [...] int32; optional bl/bp run
    the blinded R = (r + bl)*G + BP route in the same single launch. One
    kernel launch per tile; bit-identical to models/ed25519.sign."""
    from curve25519_tpu.ops.pallas import flatten_batch

    priv = jnp.asarray(priv, jnp.uint8)
    msg = jnp.asarray(msg, jnp.uint8)
    batch = jnp.broadcast_shapes(priv.shape[:-1], msg.shape[:-1])
    L = msg.shape[-1]
    b, unflatten = flatten_batch(batch)
    priv = jnp.broadcast_to(priv, batch + (64,)).reshape(b, 64)
    msg = jnp.broadcast_to(msg, batch + (L,)).reshape(b, L)
    if msg_len is None:
        msg_len = jnp.full((b,), L, jnp.int32)
    else:
        msg_len = jnp.broadcast_to(
            jnp.asarray(msg_len, jnp.int32), batch).reshape(b)

    skw, _, _ = shk._pack_words(priv[:, :32], jnp.full((b,), 32, jnp.int32))
    pkw = shk._pack4(priv[:, 32:])                            # [B, 8] u32
    hole2 = jnp.zeros((b, 32), jnp.uint8)
    hole3 = jnp.zeros((b, 64), jnp.uint8)
    w2, nbl2, nb2 = shk._pack_words(msg, msg_len, prefix=hole2)
    w3, nbl3, nb3 = shk._pack_words(msg, msg_len, prefix=hole3)

    bpad = ((b + ft.TILE_BATCH - 1) // ft.TILE_BATCH) * ft.TILE_BATCH
    g = bpad // ft.TILE_BATCH
    bl_t, bp_t = _prep_blinding(bl, bp, batch, b, bpad, g)
    sig_t = sign_tiled(
        ft.tile_lanes(_flat_pad(skw, bpad), g),
        ft.tile_lanes(_flat_pad(pkw, bpad), g),
        ft.tile_lanes(_flat_pad(w2, bpad), g),
        ft.tile_lanes(_flat_pad(nbl2[:, None].astype(jnp.int32), bpad), g),
        ft.tile_lanes(_flat_pad(w3, bpad), g),
        ft.tile_lanes(_flat_pad(nbl3[:, None].astype(jnp.int32), bpad), g),
        ft.tile_lanes(_prep_zr(zr, batch, b, bpad), g),
        nb2, nb3, bl_t, bp_t, interpret=interpret)
    return unflatten(ft.untile_lanes(sig_t)[:b].astype(jnp.uint8))
