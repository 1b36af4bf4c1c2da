"""Algebraic self-test identities, mirroring the reference selftest suite
(test/curve25519_selftest.c): order-of-base-point laws, split-key ECDH,
dual-point-multiply identities, and table regeneration from first principles."""

import numpy as np
import pytest
import jax.numpy as jnp

from curve25519_tpu import refmodel
from curve25519_tpu.config import ED_2D, ELL, P, int_to_limbs, limbs_to_int
from curve25519_tpu.models import edwards, tables
from curve25519_tpu.ops import codec, fe

rng = np.random.default_rng(21)


def _cut8_of_int(k, batch=None):
    from curve25519_tpu.ops import fold
    b = jnp.asarray(np.frombuffer(int(k).to_bytes(32, "little"), np.uint8))
    if batch is not None:
        b = jnp.broadcast_to(b, (batch, 32))
    return fold.cut8_bytes(b)


def _affine_ints(S):
    x, y = edwards.to_affine(S)
    return (limbs_to_int(np.asarray(fe.canon(x)).reshape(-1)),
            limbs_to_int(np.asarray(fe.canon(y)).reshape(-1)))


def test_order_times_base_is_identity():
    # l*G == identity and (l-1)*G == -G  (selftest :752-767)
    S = edwards.base_point_mult(_cut8_of_int(ELL))
    assert _affine_ints(S) == refmodel.IDENTITY
    S = edwards.base_point_mult(_cut8_of_int(ELL - 1))
    gx, gy = refmodel.BASE
    assert _affine_ints(S) == (P - gx, gy)       # -G


def test_split_key_ecdh():
    # k1*k2 == 1 (mod l)  =>  k2*(k1*G) == G  (selftest :786-817)
    k1 = int.from_bytes(rng.bytes(32), "little") % ELL or 1
    k2 = pow(k1, ELL - 2, ELL)
    p1 = refmodel.base_mult(k1)
    S = edwards.base_point_mult(_cut8_of_int(k2))  # k2*G
    # check k2*(k1*G) via the oracle against our k2*G composed with oracle k1
    assert refmodel.scalar_mult(k1, _affine_ints(S)) == refmodel.BASE
    assert refmodel.scalar_mult(k2, p1) == refmodel.BASE


def test_folding_table_regeneration():
    # the 256-entry table must equal subset sums computed independently
    # (selftest pre_compute_base_folding8, :498-551)
    t = tables.folding8_table()
    for idx in [0, 1, 2, 3, 17, 128, 255]:
        acc = refmodel.IDENTITY
        g = refmodel.BASE
        for i in range(8):
            if (idx >> i) & 1:
                acc = refmodel.ed_add(acc, g)
            for _ in range(32):
                g = refmodel.ed_double(g)
        x, y = acc
        assert limbs_to_int(t[idx, 0]) == (y + x) % P
        assert limbs_to_int(t[idx, 1]) == (y - x) % P
        assert limbs_to_int(t[idx, 2]) == ED_2D * x * y % P


def test_scalar_mult_linearity():
    # (a+b)*G == a*G + b*G for random a, b (dual-point identity class,
    # selftest :969-983)
    a = int.from_bytes(rng.bytes(32), "little") % ELL
    b = int.from_bytes(rng.bytes(32), "little") % ELL
    Sa = edwards.base_point_mult(_cut8_of_int(a))
    Sab = edwards.base_point_mult(_cut8_of_int((a + b) % ELL))
    sum_pt = refmodel.ed_add(_affine_ints(Sa), refmodel.base_mult(b))
    assert _affine_ints(Sab) == sum_pt


def test_edwards_mixed_form_consistency():
    # add_pe(P, to_pe(Q)) == add_pa(P, pa(Q)) == oracle P+Q for affine Q
    k1 = 12345678901234567890
    k2 = 98765432109876543210
    Pq = edwards.base_point_mult(_cut8_of_int(k1))
    Qq = edwards.base_point_mult(_cut8_of_int(k2))
    r1 = edwards.add_pe(Pq, edwards.to_pe(Qq))
    expect = refmodel.ed_add(refmodel.base_mult(k1), refmodel.base_mult(k2))
    assert _affine_ints(r1) == expect


@pytest.mark.slow
def test_dual_point_multiply_identity():
    """v*G + u*(-A) == identity for v = u^2, A = u*G — the reference's
    dual-point-multiply law (selftest :969-983), exercised through the
    verify-path double-scalar multiply (q_table + poly multiply)."""
    from curve25519_tpu.models import ed25519
    from curve25519_tpu.ops import sc

    B = 4
    u_ints = [int.from_bytes(rng.bytes(32), "little") % ELL for _ in range(B)]
    u = jnp.stack([jnp.asarray(int_to_limbs(v)) for v in u_ints])

    # A = u*G packed; verify_init negates it into the q_table
    from curve25519_tpu.ops import fold
    s = edwards.base_point_mult(fold.cut8_limbs(u))
    ax, ay = edwards.to_affine(s)
    a_packed = codec.pack_point(fe.to_bytes(ay), fe.canon(ax)[..., 0] & 1)
    ctx = ed25519.verify_init(a_packed)
    assert bool(np.all(np.asarray(ctx["ok"])))

    v = sc.mul(u, u)                      # v = u^2 mod l
    rx, ry = ed25519._poly_point_multiply(
        fold.cut8_limbs(v), fold.cut4_limbs(u), ctx["planes"])
    # identity point: (x, y) = (0, 1)
    assert bool(np.all(np.asarray(fe.is_zero(rx))))
    assert bool(np.all(np.asarray(fe.eq(ry, fe.one(ry.shape[:-1])))))


def test_sc_reduce_extremes():
    """Order-arithmetic reduction at extreme column values — the analogue of
    the reference's eco_ReduceHiWord overflow KATs (selftest :623-655)."""
    from curve25519_tpu.ops import sc

    # x * y at maximal canonical operands
    m = ELL - 1
    a = jnp.asarray(int_to_limbs(m))[None]
    r = sc.mul(a, a)
    assert limbs_to_int(np.asarray(r)[0]) == (m * m) % ELL

    # mod of the largest normalized 260-bit value
    big = (1 << 260) - 1
    x = jnp.asarray(int_to_limbs(big))[None]
    assert limbs_to_int(np.asarray(sc.mod(x))[0]) == big % ELL

    # digest reduction of all-0xFF (largest 512-bit value)
    md = jnp.full((1, 64), 255, jnp.uint8)
    got = limbs_to_int(np.asarray(sc.from_digest(md))[0])
    assert got == ((1 << 512) - 1) % ELL


@pytest.mark.slow
def test_tablefree_verify_crosschecks_folded():
    """The table-free double-and-add verify (reference
    alt_ed25519_VerifySignature, selftest :881-912) must agree with the
    folded two-phase verify on good, tampered, and wrong-key signatures."""
    import jax
    from curve25519_tpu.models import ed25519

    B = 4
    seed = jnp.asarray(rng.integers(0, 256, (B, 32), dtype=np.uint8))
    msg = jnp.asarray(rng.integers(0, 256, (B, 48), dtype=np.uint8))
    pk, priv = ed25519.create_keypair(seed)
    sig = ed25519.sign(priv, msg)

    ok_folded = np.asarray(jax.jit(ed25519.verify)(sig, pk, msg))
    ok_free = np.asarray(jax.jit(ed25519.verify_tablefree)(sig, pk, msg))
    assert ok_folded.all() and ok_free.all()

    # tamper with each half of one signature
    for byte in (3, 40):
        bad = np.asarray(sig).copy()
        bad[:, byte] ^= 0x40
        got = np.asarray(ed25519.verify_tablefree(jnp.asarray(bad), pk, msg))
        assert not got.any()

    # wrong key: roll the pubkeys by one lane
    pk_wrong = jnp.roll(pk, 1, axis=0)
    assert not np.asarray(ed25519.verify_tablefree(sig, pk_wrong, msg)).any()


def test_folding4_table_and_base_mult():
    """FOLDING-4: the 16-entry table equals independently computed subset
    sums (reference pre_compute_base_folding4, selftest :455-497) and the
    4-fold base multiply agrees with the 8-fold path and the oracle."""
    t = tables.folding4_table()
    for idx in [0, 1, 5, 15]:
        acc = refmodel.IDENTITY
        g = refmodel.BASE
        for i in range(4):
            if (idx >> i) & 1:
                acc = refmodel.ed_add(acc, g)
            for _ in range(64):
                g = refmodel.ed_double(g)
        x, y = acc
        assert limbs_to_int(t[idx, 0]) == (y + x) % P
        assert limbs_to_int(t[idx, 1]) == (y - x) % P
        assert limbs_to_int(t[idx, 2]) == ED_2D * x * y % P

    from curve25519_tpu.ops import fold
    k = int.from_bytes(rng.bytes(32), "little") % ELL
    kb = jnp.asarray(np.frombuffer(int(k).to_bytes(32, "little"), np.uint8))
    s4 = edwards.base_point_mult_fold4(fold.cut4_bytes(kb))
    s8 = edwards.base_point_mult(_cut8_of_int(k))
    assert _affine_ints(s4) == _affine_ints(s8) == refmodel.base_mult(k)

    # zr randomization must not change the result
    zr = fe.from_int(0xDEADBEEF1234567)
    s4r = edwards.base_point_mult_fold4(fold.cut4_bytes(kb), zr=zr)
    assert _affine_ints(s4r) == refmodel.base_mult(k)
