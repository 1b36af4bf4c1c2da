"""Pallas kernel correctness in interpreter mode (CPU) vs the scan path and
the python oracle. On real TPU hardware the same kernels are exercised by
bench.py and the verify-skill drives."""

import numpy as np
import jax.numpy as jnp
import pytest

from curve25519_tpu import refmodel
from curve25519_tpu.ops import codec, fe, fold, sc
from curve25519_tpu.ops.pallas import edwards_kernel as ek
from curve25519_tpu.ops.pallas import ladder_kernel as lk

rng = np.random.default_rng(31)


@pytest.mark.slow
def test_pallas_ladder_interpret_matches_oracle():
    B = lk.ft.TILE_BATCH  # one tile
    sk = rng.integers(0, 256, (B, 32), dtype=np.uint8)
    peer = rng.integers(0, 256, (B, 32), dtype=np.uint8)
    out = np.asarray(lk.point_multiply_pallas(
        jnp.asarray(peer), jnp.asarray(sk), interpret=True))
    for i in range(3):
        assert bytes(out[i].tolist()) == refmodel.x25519(
            sk[i].tobytes(), peer[i].tobytes())


def test_tile_untile_roundtrip():
    x = jnp.asarray(rng.integers(0, 8192, (2 * lk.ft.TILE_BATCH, 20),
                                 dtype=np.int32))
    assert np.array_equal(np.asarray(lk._untile(lk._tile(x, 2))),
                          np.asarray(x))


def test_fe_tile_seam_smoke():
    """FAST-tier kernel/jnp seam check (CLAUDE.md invariant #3): one small
    interpret-mode kernel chains every fe_tile primitive on a single tile
    and must be bit-exact vs the portable fe twin. The full whole-protocol
    kernels stay in the slow tier; this compiles in seconds."""
    import functools
    import jax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from curve25519_tpu.ops.pallas import fe_tile as ft

    def kernel(x_ref, y_ref, o_ref):
        pad = ft.t_pad()
        x, y = x_ref[0], y_ref[0]
        a = ft.t_add(x, y)
        s = ft.t_sub(x, y, pad)
        m = ft.t_mul(a, s)
        q = ft.t_sqr(m)
        w = ft.t_mul_small_add(q, 121665, m)
        n = ft.t_neg(w, pad)
        o_ref[0] = ft.t_canon(n)

    spec = pl.BlockSpec((1, 20, 8, 128), lambda i: (i, 0, 0, 0),
                        memory_space=pltpu.VMEM)
    x = jnp.asarray(rng.integers(0, 8192, (1024, 20), np.int32))
    y = jnp.asarray(rng.integers(0, 8192, (1024, 20), np.int32))
    out_t = pl.pallas_call(
        kernel, grid=(1,), in_specs=[spec, spec], out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((1, 20, 8, 128), jnp.int32),
        interpret=True,
    )(lk._tile(x, 1), lk._tile(y, 1))
    got = np.asarray(lk._untile(out_t))

    a = fe.add(x, y)
    s = fe.sub(x, y)
    m = fe.mul(a, s)
    q = fe.sqr(m)
    w = fe.mul_small_add(q, 121665, m)
    want = np.asarray(fe.canon(fe.neg(w)))
    assert np.array_equal(got, want)


@pytest.mark.slow
def test_pallas_basemult_fold4_interpret_matches_scan():
    """4-fold kernel variant (16-entry table, 63 steps) vs the jnp fold-4
    scan path (reference ecp_4Folds, curve25519_utils.c:125-143)."""
    from curve25519_tpu.models import edwards
    B = 48
    sk = codec.clamp(jnp.asarray(
        rng.integers(0, 256, (B, 32), dtype=np.uint8)))
    cut = fold.cut4_bytes(sk)
    s = edwards.base_point_mult_fold4(cut)
    x_ref, y_ref = edwards.to_affine(s)
    x_p, y_p = ek.base_mult_pallas(cut, mode="affine", interpret=True,
                                   nfolds=4)
    assert np.array_equal(np.asarray(fe.to_bytes(x_p)),
                          np.asarray(fe.to_bytes(x_ref)))
    assert np.array_equal(np.asarray(fe.to_bytes(y_p)),
                          np.asarray(fe.to_bytes(y_ref)))


@pytest.mark.slow
def test_pallas_basemult_interpret_matches_scan():
    """Edwards folding kernel (affine + mont_u modes, with padding) vs the
    jnp scan path (which is itself tested against the python oracle)."""
    from curve25519_tpu.models import edwards
    B = 96  # exercises the pad-to-1024 path
    sk = codec.clamp(jnp.asarray(
        rng.integers(0, 256, (B, 32), dtype=np.uint8)))
    cut = fold.cut8_bytes(sk)

    s = edwards.base_point_mult(cut)
    x_ref, y_ref = edwards.to_affine(s)
    x_p, y_p = ek.base_mult_pallas(cut, mode="affine", interpret=True)
    assert np.array_equal(np.asarray(fe.to_bytes(x_p)),
                          np.asarray(fe.to_bytes(x_ref)))
    assert np.array_equal(np.asarray(fe.to_bytes(y_p)),
                          np.asarray(fe.to_bytes(y_ref)))

    # packed-point mode: in-kernel canon + compression must equal the
    # models-layer _pack of the affine result
    pk_p = ek.base_mult_pallas(cut, mode="pk", interpret=True)
    parity = np.asarray(fe.canon(x_ref))[..., 0] & 1
    want_pk = np.asarray(fe.to_bytes(y_ref)).copy()
    want_pk[..., 31] = (want_pk[..., 31] & 0x7F) | (parity << 7).astype(
        np.uint8)
    assert np.array_equal(np.asarray(pk_p), want_pk)

    u_ref = fe.mul(fe.add(s["z"], s["y"]), fe.inv(fe.sub(s["z"], s["y"])))
    u_p, _ = ek.base_mult_pallas(cut, mode="mont_u", interpret=True)
    assert np.array_equal(np.asarray(fe.to_bytes(u_p)),
                          np.asarray(fe.to_bytes(u_ref)))

    # u_bytes mode: in-kernel enc(u)
    ub_p = ek.base_mult_pallas(cut, mode="u_bytes", interpret=True)
    assert np.array_equal(np.asarray(ub_p), np.asarray(fe.to_bytes(u_ref)))


@pytest.mark.slow
def test_pallas_basemult_blinded_interpret():
    """(a + bl)*G + BP through the kernel == a*G (blinding must not change
    the result), reference edp_BasePointMultiply (ed25519_sign.c:246-268)."""
    from curve25519_tpu.models import blinding, edwards
    B = 64
    seed = jnp.asarray(rng.integers(0, 256, (B, 32), dtype=np.uint8))
    a = fe.from_bytes(codec.clamp(seed))
    ctx = blinding.as_batch(blinding.blinding_init(b"kernel-blind-test"), (B,))
    t = sc.add(sc.mod(a), ctx["bl"])
    x_p, y_p = ek.base_mult_pallas(
        fold.cut8_limbs(t), zr=ctx["zr"], bp=ctx["bp"],
        mode="affine", interpret=True)
    x_ref, y_ref = edwards.to_affine(
        edwards.base_point_mult(fold.cut8_bytes(codec.clamp(seed))))
    assert np.array_equal(np.asarray(fe.to_bytes(x_p)),
                          np.asarray(fe.to_bytes(x_ref)))
    assert np.array_equal(np.asarray(fe.to_bytes(y_p)),
                          np.asarray(fe.to_bytes(y_ref)))


@pytest.mark.slow
def test_pallas_poly_mult_interpret_matches_scan():
    """Verify kernel (s*G + h*(-Q)) vs the jnp poly-multiply path."""
    from curve25519_tpu.models import ed25519
    from curve25519_tpu.ops.pallas import verify_kernel as vk
    from curve25519_tpu.ops.sha512 import sha512
    B = 48
    seed = jnp.asarray(rng.integers(0, 256, (B, 32), dtype=np.uint8))
    msg = jnp.asarray(rng.integers(0, 256, (B, 40), dtype=np.uint8))
    mlen = jnp.full((B,), 40, jnp.int32)
    pk, priv = ed25519.create_keypair(seed)
    sig = ed25519.sign(priv, msg, mlen)
    ctx = ed25519.verify_init(pk)

    from curve25519_tpu.ops import sc
    hmsg = jnp.concatenate([sig[..., :32], pk, msg], -1)
    h = sc.from_digest(sha512(hmsg, 64 + mlen))
    u = fold.cut8_bytes(sig[..., 32:])
    v = fold.cut4_limbs(h)

    rx_ref, ry_ref = ed25519._poly_point_multiply(u, v, ctx["planes"])
    want = np.asarray(ed25519._pack(rx_ref, ry_ref))
    r_p = vk.poly_mult_pallas(u, v, ctx["planes"], interpret=True)
    assert np.array_equal(np.asarray(r_p), want)


@pytest.mark.slow
def test_pallas_poly_mult_shared_qt_interpret():
    """Shared-pk fast path (one pk, many messages — VERDICT r2 item 5): the
    shared-MXU-operand kernel must be bit-exact vs the per-lane-table kernel
    and the jnp path."""
    from curve25519_tpu.models import ed25519
    from curve25519_tpu.ops.pallas import verify_kernel as vk
    from curve25519_tpu.ops.sha512 import sha512
    from curve25519_tpu.ops import sc
    B = 40
    seed = jnp.asarray(rng.integers(0, 256, (1, 32), dtype=np.uint8))
    msg = jnp.asarray(rng.integers(0, 256, (B, 24), dtype=np.uint8))
    mlen = jnp.full((B,), 24, jnp.int32)
    pk, priv = ed25519.create_keypair(seed[0])
    sig = ed25519.sign(jnp.broadcast_to(priv, (B, 64)), msg, mlen)
    ctx = ed25519.verify_init(pk)              # unbatched: planes [16, 160]
    assert ctx["planes"].ndim == 2

    hmsg = jnp.concatenate(
        [sig[..., :32], jnp.broadcast_to(pk, (B, 32)), msg], -1)
    h = sc.from_digest(sha512(hmsg, 64 + mlen))
    u = fold.cut8_bytes(sig[..., 32:])
    v = fold.cut4_limbs(h)

    rx_ref, ry_ref = ed25519._poly_point_multiply(u, v, ctx["planes"])
    want = np.asarray(ed25519._pack(rx_ref, ry_ref))
    r_p = vk.poly_mult_pallas(u, v, ctx["planes"], interpret=True)
    assert np.array_equal(np.asarray(r_p), want)


@pytest.mark.slow
def test_pallas_verify_oneshot_fused_interpret():
    """The fused one-shot kernel (decompress + q_table + poly multiply in
    one launch, q_table VMEM-resident) must be bit-exact vs the two-phase
    jnp path on valid, tampered, and invalid-pk lanes."""
    from curve25519_tpu.models import ed25519
    from curve25519_tpu.ops.pallas import verify_kernel as vk
    from curve25519_tpu.ops.sha512 import sha512

    B = 24
    seed = jnp.asarray(rng.integers(0, 256, (B, 32), dtype=np.uint8))
    msg = jnp.asarray(rng.integers(0, 256, (B, 32), dtype=np.uint8))
    mlen = jnp.full((B,), 32, jnp.int32)
    pk, priv = ed25519.create_keypair(seed)
    sig = ed25519.sign(priv, msg, mlen)
    # lane 0: tampered sig; lane 1: invalid pk
    sig = sig.at[0, 3].set(sig[0, 3] ^ 1)
    pk_np = np.asarray(pk).copy()
    pk_np[1] = 2  # y = 2 is not on the curve
    pk_np[1, 1:] = 0
    pkj = jnp.asarray(pk_np)

    want = np.asarray(ed25519.verify(sig, pkj, msg, mlen))  # CPU jnp path
    assert not want[0] and not want[1] and want[2:].all()

    hpfx = jnp.concatenate([sig[..., :32], pkj], -1)
    h = sc.from_digest(sha512(msg, mlen, prefix=hpfx))
    y_bytes, parity = codec.unpack_parity(pkj)
    r_bytes, ok = vk.verify_oneshot_pallas(
        fe.from_bytes(y_bytes), 1 - parity,
        fold.cut8_bytes(sig[..., 32:]), fold.cut4_limbs(h),
        interpret=True)
    got = np.logical_and(
        np.all(np.asarray(r_bytes) == np.asarray(sig[..., :32]), axis=-1),
        np.asarray(ok))
    assert np.array_equal(got, want)
    # byte-level: where the pk decodes, enc(R') must equal the two-phase
    # kernel's bytes
    ctx = ed25519.verify_init(pkj)
    u = fold.cut8_bytes(sig[..., 32:])
    rx, ry = ed25519._poly_point_multiply(u, fold.cut4_limbs(h),
                                          ctx["planes"])
    want_r = np.asarray(ed25519._pack(rx, ry))
    okm = np.asarray(ctx["ok"])
    assert np.array_equal(np.asarray(r_bytes)[okm], want_r[okm])


@pytest.mark.slow
def test_pallas_verify_init_interpret_matches_scan():
    """Verify_Init kernel (decompress + 192-double q_table build) vs the jnp
    path, including an invalid (non-point) pubkey lane."""
    from curve25519_tpu.models import ed25519, tables
    from curve25519_tpu.ops.pallas import verify_kernel as vk
    B = 32
    seed = jnp.asarray(rng.integers(0, 256, (B, 32), dtype=np.uint8))
    pk, _ = ed25519.create_keypair(seed)
    pk_np = np.asarray(pk).copy()
    pk_np[0] = rng.integers(0, 256, 32, dtype=np.uint8)  # likely invalid
    pkj = jnp.asarray(pk_np)

    ctx_ref = ed25519.verify_init(pkj)
    y_bytes, parity = codec.unpack_parity(pkj)
    arr, ok = vk.verify_init_pallas(fe.from_bytes(y_bytes), 1 - parity,
                                    interpret=True)
    # kernel output is canonical by contract — assert the split needs no
    # further reduction AND matches the jnp path's canon'd planes exactly
    planes = tables.pe_planes_from_canonical(arr)
    assert np.array_equal(np.asarray(planes),
                          np.asarray(tables.pe_planes_from_array(arr)))

    # both paths canonicalize, so the int8 planes are bit-identical
    assert np.array_equal(np.asarray(planes), np.asarray(ctx_ref["planes"]))
    assert np.array_equal(np.asarray(ok), np.asarray(ctx_ref["ok"]))


@pytest.mark.slow
def test_pallas_sc_tile_matches_jnp():
    """In-kernel sc25519 tile ops (ops/pallas/sc_tile.py) vs the jnp twins:
    digest reduction mod l, byte->limb codec, mod/mul/add, clamp + 8-fold
    cut, and the BE half-word round-trip used for SHA splicing."""
    import jax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from curve25519_tpu.ops.pallas import fe_tile as ft
    from curve25519_tpu.ops.pallas import sc_tile as sct

    B = ft.TILE_BATCH
    md = rng.integers(0, 256, (B, 64), dtype=np.uint8)
    xb = rng.integers(0, 256, (B, 32), dtype=np.uint8)

    def kernel(md_ref, xb_ref, o1, o2, o3, o4, o5):
        mdr, xbr = md_ref[0], xb_ref[0]
        r = sct.sc_from_digest_rows(mdr)
        o1[0] = r
        lim = sct.limbs_from_byte_rows(xbr)
        o2[0] = lim
        a = sct.sc_mod(lim)
        o3[0] = sct.sc_muladd(r, a, a)
        digs = sct.cut8_rows(
            sct.limbs_from_byte_rows(sct.clamp_rows(xbr)))
        o4[0] = jnp.stack(digs, axis=0)
        o5[0] = sct.bytes_from_halves(sct.halves_from_byte_rows(xbr))

    def spec(k):
        return pl.BlockSpec((1, k, ft.TILE_S, ft.TILE_L),
                            lambda i: (i, 0, 0, 0),
                            memory_space=pltpu.VMEM)

    outs = pl.pallas_call(
        kernel, grid=(1,), in_specs=[spec(64), spec(32)],
        out_specs=tuple(spec(k) for k in (20, 20, 20, 32, 32)),
        out_shape=tuple(jax.ShapeDtypeStruct((1, k, 8, 128), jnp.int32)
                        for k in (20, 20, 20, 32, 32)),
        interpret=True,
    )(ft.tile_lanes(jnp.asarray(md, jnp.int32), 1),
      ft.tile_lanes(jnp.asarray(xb, jnp.int32), 1))
    o1, o2, o3, o4, o5 = [ft.untile_lanes(o) for o in outs]

    r_ref = sc.from_digest(jnp.asarray(md))
    lim_ref = fe.from_bytes(jnp.asarray(xb))
    a_ref = sc.mod(lim_ref)
    assert np.array_equal(np.asarray(o1), np.asarray(r_ref))
    assert np.array_equal(np.asarray(o2), np.asarray(lim_ref))
    assert np.array_equal(np.asarray(o3),
                          np.asarray(sc.muladd(r_ref, a_ref, a_ref)))
    assert np.array_equal(
        np.asarray(o4),
        np.asarray(fold.cut8_limbs(fe.from_bytes(
            codec.clamp(jnp.asarray(xb))))))
    assert np.array_equal(np.asarray(o5), np.asarray(xb, dtype=np.int32))


@pytest.mark.slow
def test_pallas_keygen_fused_interpret_matches_jnp():
    """The one-launch keygen kernel (SHA-512 + clamp + cut + base mult +
    pack) must be bit-exact vs models/ed25519.create_keypair."""
    from curve25519_tpu.models import ed25519
    from curve25519_tpu.models.blinding import default_zr
    from curve25519_tpu.ops.pallas import sign_kernel as sgk

    B = 64
    seed = jnp.asarray(rng.integers(0, 256, (B, 32), dtype=np.uint8))
    pk_ref, _ = ed25519.create_keypair(seed)          # CPU jnp path
    pk = sgk.keygen_fused_pallas(seed, zr=default_zr(), interpret=True)
    assert np.array_equal(np.asarray(pk), np.asarray(pk_ref))


@pytest.mark.slow
def test_pallas_sign_fused_interpret_matches_jnp():
    """The one-launch sign kernel (3 SHA-512 runs with spliced prefixes,
    digest reduction mod l, fold cut, base mult, S = h*a + r) must be
    bit-exact vs models/ed25519.sign across ragged message lengths,
    including 0 and the full buffer."""
    from curve25519_tpu.models import ed25519
    from curve25519_tpu.models.blinding import default_zr
    from curve25519_tpu.ops.pallas import sign_kernel as sgk

    B = 64
    seed = jnp.asarray(rng.integers(0, 256, (B, 32), dtype=np.uint8))
    pk, priv = ed25519.create_keypair(seed)
    msg = jnp.asarray(rng.integers(0, 256, (B, 64), dtype=np.uint8))
    mlen = jnp.asarray(rng.integers(0, 65, (B,), dtype=np.int32))
    mlen = mlen.at[0].set(0).at[1].set(64)
    sig_ref = ed25519.sign(priv, msg, mlen)           # CPU jnp path
    sig = sgk.sign_fused_pallas(priv, msg, mlen, zr=default_zr(),
                                interpret=True)
    assert np.array_equal(np.asarray(sig), np.asarray(sig_ref))
    assert bool(np.asarray(ed25519.verify(sig, pk, msg, mlen)).all())


@pytest.mark.slow
def test_pallas_sign_fused_blinded_interpret_matches_jnp():
    """The blinded route of the fused kernels — (a + bl)*G + BP with the
    ctx's zr — must be bit-exact vs the jnp blinded composition AND leave
    signatures/pubkeys unchanged vs unblinded (the reference's blinding
    invariance, test/curve25519_test.c:323-410)."""
    from curve25519_tpu.models import blinding, ed25519
    from curve25519_tpu.ops.pallas import sign_kernel as sgk

    B = 48
    seed = jnp.asarray(rng.integers(0, 256, (B, 32), dtype=np.uint8))
    msg = jnp.asarray(rng.integers(0, 256, (B, 48), dtype=np.uint8))
    mlen = jnp.asarray(rng.integers(0, 49, (B,), dtype=np.int32))
    bl = blinding.blinding_init(bytes(rng.integers(0, 256, 64,
                                                   dtype=np.uint8)))
    blb = blinding.as_batch(bl, (B,))

    pk_ref, priv = ed25519.create_keypair(seed, blinding=blb)  # CPU jnp
    pk = sgk.keygen_fused_pallas(seed, zr=blb["zr"], bl=blb["bl"],
                                 bp=blb["bp"], interpret=True)
    assert np.array_equal(np.asarray(pk), np.asarray(pk_ref))

    sig_ref = ed25519.sign(priv, msg, mlen, blinding=blb)
    sig = sgk.sign_fused_pallas(priv, msg, mlen, zr=blb["zr"],
                                bl=blb["bl"], bp=blb["bp"], interpret=True)
    assert np.array_equal(np.asarray(sig), np.asarray(sig_ref))
    assert np.array_equal(np.asarray(sig_ref),
                          np.asarray(ed25519.sign(priv, msg, mlen)))
