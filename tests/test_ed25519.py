"""Ed25519 tests: RFC 8032 §7.1 vectors (vector 2 is the reference's KAT,
test/curve25519_test.c:412-424), batched sign/verify round-trips, blinding
invariance (signature_test asserts blinding does not change signatures,
test/curve25519_test.c:323-410), two-phase verify, tamper rejection, and
differential testing against the pure-python oracle."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from curve25519_tpu import refmodel
from curve25519_tpu.models import blinding, ed25519

rng = np.random.default_rng(11)

# Module-level jitted wrappers: a fresh jax.jit(...) per test retraces and
# re-looks-up the compile cache every time; sharing one wrapper lets
# same-shape calls across tests in this file reuse the traced+compiled
# graph within a pytest worker (pair with --dist loadfile).
JK = jax.jit(ed25519.create_keypair)
JS = jax.jit(ed25519.sign)
JV = jax.jit(ed25519.verify, static_argnames=("strict",))
JK_BL = jax.jit(lambda s, bl: ed25519.create_keypair(s, blinding=bl))
JS_BL = jax.jit(lambda p, m, bl: ed25519.sign(p, m, blinding=bl))


def b2a(hexstr):
    return jnp.asarray(np.frombuffer(bytes.fromhex(hexstr), np.uint8))


def a2b(a):
    return bytes(np.asarray(a).reshape(-1).tolist())


VECS = [
    # (sk, pk, msg, sig) — RFC 8032 §7.1 TEST 1-3
    ("9d61b19deffd5a60ba844af492ec2cc44449c5697b326919703bac031cae7f60",
     "d75a980182b10ab7d54bfed3c964073a0ee172f3daa62325af021a68f707511a",
     "",
     "e5564300c360ac729086e2cc806e828a84877f1eb8e5d974d873e06522490155"
     "5fb8821590a33bacc61e39701cf9b46bd25bf5f0595bbe24655141438e7a100b"),
    ("4ccd089b28ff96da9db6c346ec114e0f5b8a319f35aba624da8cf6ed4fb8a6fb",
     "3d4017c3e843895a92b70aa74d1b7ebc9c982ccf2ec4968cc0cd55f12af4660c",
     "72",
     "92a009a9f0d4cab8720e820b5f642540a2b27b5416503f8fb3762223ebdb69da"
     "085ac1e43e15996e458f3613d0f11d8c387b2eaeb4302aeeb00d291612bb0c00"),
    ("c5aa8df43f9f837bedb7442f31dcb7b166d38535076f094b85ce3a2e0b4458f7",
     "fc51cd8e6218a1a38da47ed00230f0580816ed13ba3303ac5deb911548908025",
     "af82",
     "6291d657deec24024827e69c3abe01a30ce548a284743a445e3680d7db5ac3ac"
     "18ff9b538d16f290ae67f760984dc6594a7c15e9716ed28dc027beceea1ec40a"),
]


def _pad_msgs(hex_msgs, L=8):
    msgs = np.zeros((len(hex_msgs), L), np.uint8)
    lens = []
    for i, h in enumerate(hex_msgs):
        b = bytes.fromhex(h)
        msgs[i, :len(b)] = np.frombuffer(b, np.uint8)
        lens.append(len(b))
    return jnp.asarray(msgs), jnp.asarray(lens, jnp.int32)


def test_rfc8032_keygen_sign():
    sks = jnp.stack([b2a(v[0]) for v in VECS])
    pk, priv = JK(sks)
    for i, v in enumerate(VECS):
        assert a2b(pk[i]).hex() == v[1], i
    msgs, lens = _pad_msgs([v[2] for v in VECS])
    sigs = JS(priv, msgs, lens)
    for i, v in enumerate(VECS):
        assert a2b(sigs[i]).hex() == v[3], i


def test_rfc8032_verify():
    pks = jnp.stack([b2a(v[1]) for v in VECS])
    sigs = jnp.stack([b2a(v[3]) for v in VECS])
    msgs, lens = _pad_msgs([v[2] for v in VECS])
    ok = JV(sigs, pks, msgs, lens)
    assert np.asarray(ok).all()
    # strict-mode accept/reject semantics are covered (without another
    # whole-verify compile here) by tests/test_edge_encodings.py's
    # [strict-*] parametrizations and test_strict_rejects_malleable_s


def test_tamper_rejection():
    pks = jnp.stack([b2a(v[1]) for v in VECS])
    sigs = jnp.stack([b2a(v[3]) for v in VECS])
    msgs, lens = _pad_msgs([v[2] for v in VECS])
    # one batched jitted verify over all four tampered rows (bit flipped in
    # R, in S, in the message, and a swapped pubkey) — four eager verify
    # calls would each pay op-by-op dispatch of the whole double-scalar mult
    bad_r = sigs.at[0, 3].set(sigs[0, 3] ^ 1)
    bad_s = sigs.at[1, 40].set(sigs[1, 40] ^ 0x10)
    bad_m = msgs.at[2, 0].set(msgs[2, 0] ^ 0x80)
    # row 4 is an UNTAMPERED positive control: a verify that rejected
    # everything would otherwise pass this test
    rows_sig = jnp.stack([bad_r[0], bad_s[1], sigs[2], sigs[0], sigs[0]])
    rows_pk = jnp.stack([pks[0], pks[1], pks[2], pks[::-1][0], pks[0]])
    rows_msg = jnp.stack([msgs[0], msgs[1], bad_m[2], msgs[0], msgs[0]])
    rows_len = jnp.stack([lens[0], lens[1], lens[2], lens[0], lens[0]])
    ok = np.asarray(JV(rows_sig, rows_pk, rows_msg,
                                            rows_len))
    assert not ok[:4].any()
    assert ok[4]


def test_batch_round_trip_vs_oracle():
    B, L = 6, 40
    sks = jnp.asarray(rng.integers(0, 256, (B, 32), dtype=np.uint8))
    msgs = jnp.asarray(rng.integers(0, 256, (B, L), dtype=np.uint8))
    pk, priv = JK(sks)
    sigs = JS(priv, msgs)
    ok = JV(sigs, pk, msgs)
    assert np.asarray(ok).all()
    # differential: python oracle agrees on pk, sig, and verdict
    for i in range(B):
        sk_b = a2b(sks[i])
        pk_ref, priv_ref = refmodel.ed_keypair(sk_b)
        assert a2b(pk[i]) == pk_ref
        sig_ref = refmodel.ed_sign(priv_ref, a2b(msgs[i]))
        assert a2b(sigs[i]) == sig_ref
        assert refmodel.ed_verify(a2b(sigs[i]), pk_ref, a2b(msgs[i]))


@pytest.mark.slow
def test_two_phase_verify_amortized():
    # one pubkey, many messages — Verify_Init once, Verify_Check per message
    sk = jnp.asarray(rng.integers(0, 256, (32,), dtype=np.uint8))
    pk, priv = ed25519.create_keypair(sk)
    B, L = 5, 16
    msgs = jnp.asarray(rng.integers(0, 256, (B, L), dtype=np.uint8))
    sigs = ed25519.sign(jnp.broadcast_to(priv, (B, 64)), msgs)
    ctx = jax.jit(ed25519.verify_init)(pk)
    ok = jax.jit(ed25519.verify_check)(ctx, sigs, msgs)
    assert np.asarray(ok).all()
    bad = sigs.at[2, 35].set(sigs[2, 35] ^ 4)
    ok2 = np.asarray(ed25519.verify_check(ctx, bad, msgs))
    assert ok2.tolist() == [True, True, False, True, True]


def test_blinding_does_not_change_signatures():
    # the reference asserts signatures are identical with/without blinding
    ctx = blinding.blinding_init(b"test blinding seed 123")
    # drop the host-side chaining ints (_b etc.) — they are not jit-traceable
    ctx = {k: v for k, v in ctx.items() if not k.startswith("_")}
    B, L = 4, 24
    sks = jnp.asarray(rng.integers(0, 256, (B, 32), dtype=np.uint8))
    msgs = jnp.asarray(rng.integers(0, 256, (B, L), dtype=np.uint8))
    pk0, priv0 = JK(sks)
    pk1, priv1 = JK_BL(sks, ctx)
    assert np.array_equal(np.asarray(pk0), np.asarray(pk1))
    s0 = JS(priv0, msgs)
    s1 = JS_BL(priv1, msgs, ctx)
    assert np.array_equal(np.asarray(s0), np.asarray(s1))


@pytest.mark.slow
def test_strict_rejects_malleable_s():
    # fast-tier twin: the malleable-s-plus-l vector in
    # tests/test_edge_encodings.py asserts the same accept/reject pair
    from curve25519_tpu.config import ELL
    pks = jnp.stack([b2a(v[1]) for v in VECS])[:1]
    sigs = jnp.stack([b2a(v[3]) for v in VECS])[:1]
    msgs, lens = _pad_msgs([VECS[0][2]])
    s = int.from_bytes(a2b(sigs[0][32:]), "little")
    s_mall = (s + ELL).to_bytes(32, "little")
    sig_mall = jnp.asarray(np.frombuffer(a2b(sigs[0][:32]) + s_mall, np.uint8))[None]
    # reference semantics: accepted; strict RFC mode: rejected
    assert np.asarray(JV(sig_mall, pks, msgs, lens))[0]
    assert not np.asarray(JV(sig_mall, pks, msgs, lens, strict=True))[0]


def test_invalid_pubkey_rejected():
    # y >= p or non-square x^2 candidates must fail rather than crash
    bad_pk = jnp.asarray(np.full((1, 32), 0xFF, np.uint8))
    sigs = jnp.stack([b2a(VECS[0][3])])
    msgs, lens = _pad_msgs([VECS[0][2]])
    assert not np.asarray(JV(sigs, bad_pk, msgs, lens))[0]


def test_verify_finish_and_blinding_finish():
    """Context teardown API parity (reference Verify_Finish /
    Blinding_Finish)."""
    from curve25519_tpu.models import blinding
    seed = jnp.asarray(rng.integers(0, 256, (4, 32), dtype=np.uint8))
    pk, priv = ed25519.create_keypair(seed)
    ctx = ed25519.verify_init(pk)
    ed25519.verify_finish(ctx)
    assert ctx["planes"].is_deleted()
    # the caller's own key array aliases ctx["pk"] and must survive teardown
    assert not pk.is_deleted()
    np.asarray(pk)

    bctx = blinding.blinding_init(b"finish-test")
    blinding.blinding_finish(bctx)
    assert bctx == {}
