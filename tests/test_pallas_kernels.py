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
