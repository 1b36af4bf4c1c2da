"""Adversarial-encoding vectors (wycheproof-style).

Pins the accept/reject decision of every decode edge the reference's
semantics define (reference: ecp_DecodeInt masks bit 255 and never
range-checks y, source/curve25519_utils.c:100-123; verify compares
encodings with memcmp and never range-checks S,
source/ed25519_verify.c:287-313), across FOUR independent paths:

- `ed25519.verify` (folded q_table path — the production verifier),
- `ed25519.verify_tablefree` (independent double-and-add oracle),
- the native C++ host core (radix-2^51, the oo.py latency path),
- an inline big-int oracle built from refmodel primitives.

All four were confirmed to agree on every vector; these tests freeze that
agreement. Decode semantics (documented in models/ed25519.py):

1. y >= p in a compressed point decodes as y - p (no canonicity check).
2. x = 0 with sign bit 1 is accepted (negation of zero is zero).
3. Small-order / identity public keys are accepted; no cofactor checks.
4. S >= l accepted unless strict=True (RFC 8032 semantics opt-in).
5. R' vs R comparison is at the ENCODING level (memcmp), so a signature
   whose R bytes are non-canonical never verifies even when the underlying
   point matches.
6. X25519 u-coordinates: bit 255 masked, then u >= p behaves as u - p
   (mod-p arithmetic); all-zero outputs are NOT rejected (contributory
   behavior is the caller's concern, as in the reference).
"""

import hashlib

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from curve25519_tpu import refmodel as rm
from curve25519_tpu.config import ELL, P
from curve25519_tpu.models import ed25519, x25519

try:
    from curve25519_tpu.native import bindings as nb
    nb.load()
except Exception:         # pragma: no cover - native toolchain missing
    nb = None

MSG = b"edge vector msg!"                      # 16 bytes, shared shape


def oracle_verify(sig, pk, msg, strict=False):
    """Inline big-int verifier with the reference's non-strict semantics
    (strict adds only the RFC 8032 S < l check)."""
    q = rm.decompress(pk)
    if q is None:
        return False
    s = int.from_bytes(sig[32:], "little")
    if strict and s >= ELL:
        return False
    h = int.from_bytes(
        hashlib.sha512(sig[:32] + pk + msg).digest(), "little") % ELL
    neg_q = (P - q[0] % P, q[1])
    rp = rm.ed_add(rm.base_mult(s), rm.scalar_mult(h, neg_q))
    return rm.compress(rp) == sig[:32]


def _vectors():
    """(name, pk, sig, msg, expect_nonstrict, expect_strict) table.
    Expectations are hard-coded (frozen semantics), and each vector is
    additionally cross-checked against the inline oracle at test time."""
    pk, priv = rm.ed_keypair(b"\x01" * 32)
    sig = rm.ed_sign(priv, MSG)
    s_int = int.from_bytes(sig[32:], "little")
    md = hashlib.sha512(priv[:32]).digest()
    a = rm._clamp(md[:32])

    def le(v):
        return v.to_bytes(32, "little")

    # forgery against a small-order pk: R = enc(s*G), S = s works whenever
    # h * (-Q) degenerates to the identity (h = 0 mod the point's order)
    def forge_for(pk_bytes, order):
        for s_try in range(1, 400):
            r_bytes = rm.compress(rm.base_mult(s_try))
            h = int.from_bytes(hashlib.sha512(
                r_bytes + pk_bytes + MSG).digest(), "little") % ELL
            if h % order == 0:
                return r_bytes + le(s_try)
        raise AssertionError("no forgery scalar found")

    s0 = 12345
    forge_id = rm.compress(rm.base_mult(s0)) + le(s0)

    # r = 0 signature: R = enc(identity), S = h*a — valid by construction
    r_id = rm.compress((0, 1))
    h = int.from_bytes(
        hashlib.sha512(r_id + pk + MSG).digest(), "little") % ELL
    sig_r0 = r_id + le(h * a % ELL)
    # same point for R but NON-canonical bytes (p+1 encodes identity too):
    # must reject, the R comparison is memcmp on encodings
    r_nc = le(P + 1)
    h = int.from_bytes(
        hashlib.sha512(r_nc + pk + MSG).digest(), "little") % ELL
    sig_rnc = r_nc + le(h * a % ELL)

    return [
        # name, pk, sig, msg, nonstrict, strict
        ("valid", pk, sig, MSG, True, True),
        ("tampered-msg", pk, sig, b"edge vector msg?", False, False),
        ("tampered-sig", pk, bytes([sig[0] ^ 1]) + sig[1:], MSG,
         False, False),
        # y = 2 is a QR failure: (y^2-1)/(d y^2+1) is non-square
        ("pk-not-on-curve", le(2), sig, MSG, False, False),
        # y = 2^255 - 1 (masked): also not on curve
        ("pk-max-y", le(2 ** 255 - 1), sig, MSG, False, False),
        # identity pk: -Q = identity, so (enc(s*G), s) verifies any message
        ("identity-pk-forge", le(1), forge_id, MSG, True, True),
        # y = p + 1 decodes as y = 1 (identity): same forgery accepted —
        # non-canonical y is NOT rejected (semantics note 1)
        ("identity-pk-noncanonical", le(P + 1), forge_id, MSG, True, True),
        # identity with sign bit set: x = 0 accepts parity 1 (note 2)
        ("identity-pk-signbit", le(1 | 1 << 255), forge_id, MSG, True, True),
        # all-zero pk = (x_even, y=0), an order-4 point; forgeable with
        # h = 0 mod 8 (note 3)
        ("zero-pk-forge", le(0), forge_for(le(0), 8), MSG, True, True),
        # y = p decodes as y = 0: same small-order acceptance
        ("zero-pk-noncanonical", le(P), forge_for(le(P), 8), MSG,
         True, True),
        # S' = S + l: the reference's malleable encoding (note 4)
        ("malleable-s-plus-l", pk, sig[:32] + le(s_int + ELL), MSG,
         True, False),
        ("malleable-s-plus-2l", pk, sig[:32] + le(s_int + 2 * ELL), MSG,
         True, False),
        ("s-all-ff", pk, sig[:32] + b"\xff" * 32, MSG, False, False),
        ("s-zero", pk, sig[:32] + bytes(32), MSG, False, False),
        ("r-zero-sig", pk, sig_r0, MSG, True, True),
        # R bytes non-canonical for the same point: memcmp rejects (note 5)
        ("noncanonical-R-bytes", pk, sig_rnc, MSG, False, False),
    ]


VECTORS = _vectors()


_JVERIFY = jax.jit(ed25519.verify, static_argnames=("strict",))
_JVERIFY_TF = jax.jit(ed25519.verify_tablefree, static_argnames=("strict",))


def _batched(strict, tablefree):
    pks = jnp.asarray(np.stack([np.frombuffer(v[1], np.uint8)
                                for v in VECTORS]))
    sigs = jnp.asarray(np.stack([np.frombuffer(v[2], np.uint8)
                                 for v in VECTORS]))
    msgs = jnp.asarray(np.stack([np.frombuffer(v[3], np.uint8)
                                 for v in VECTORS]))
    fn = _JVERIFY_TF if tablefree else _JVERIFY
    return np.asarray(fn(sigs, pks, msgs, strict=strict))


@pytest.mark.parametrize("tablefree", [False, True],
                         ids=["folded", "tablefree"])
@pytest.mark.parametrize("strict", [False, True],
                         ids=["nonstrict", "strict"])
def test_edge_vectors(strict, tablefree):
    got = _batched(strict, tablefree)
    for i, (name, pk, sig, msg, ns, st) in enumerate(VECTORS):
        want = st if strict else ns
        assert bool(got[i]) == want, (name, "strict" if strict else "nonstrict")


def test_edge_vectors_match_inline_oracle():
    for name, pk, sig, msg, ns, st in VECTORS:
        assert oracle_verify(sig, pk, msg) == ns, name
        assert oracle_verify(sig, pk, msg, strict=True) == st, name


@pytest.mark.skipif(nb is None, reason="native host core unavailable")
def test_edge_vectors_match_native():
    """The native C++ host path (oo.py's single-op route) implements the
    non-strict semantics — it must agree on every vector."""
    for name, pk, sig, msg, ns, st in VECTORS:
        assert nb.ed25519_verify(sig, pk, msg) == ns, name


def test_x25519_edge_u_coordinates():
    """Ladder decode edges (note 6): bit-255 masking, u >= p aliasing, and
    small-order inputs yielding all-zero secrets — all three paths agree."""
    sk = b"\x07" * 32
    cases = [
        ("u-zero", 0), ("u-one", 1), ("u-p", P), ("u-p-plus-1", P + 1),
        ("u-max", 2 ** 255 - 1), ("u-highbit", 1 | 1 << 255),
        # known order-8 Montgomery point
        ("u-small-order", 39382357235489614581723060781553021112529911719440698176882885853963445705823),
    ]
    peers = jnp.asarray(np.stack(
        [np.frombuffer(u.to_bytes(32, "little"), np.uint8)
         for _, u in cases]))
    sks = jnp.broadcast_to(jnp.asarray(np.frombuffer(sk, np.uint8)),
                           (len(cases), 32))
    got = np.asarray(x25519.create_shared_key(peers, sks))
    for i, (name, u) in enumerate(cases):
        ub = u.to_bytes(32, "little")
        want = rm.x25519(sk, ub)
        assert bytes(got[i].tolist()) == want, name
        if nb is not None:
            assert nb.x25519(sk, ub) == want, name
    # u >= p aliases u - p exactly
    assert bytes(got[2].tolist()) == bytes(got[0].tolist())   # p ~ 0
    assert bytes(got[3].tolist()) == bytes(got[1].tolist())   # p+1 ~ 1
    # small-order input contributes nothing: all-zero secret, not an error
    assert bytes(got[0].tolist()) == bytes(32)


def test_keygen_sign_extreme_seeds():
    """All-zero / all-FF seeds through keygen + sign match the oracle."""
    seeds = [bytes(32), b"\xff" * 32, bytes(range(32))]
    arr = jnp.asarray(np.stack([np.frombuffer(s, np.uint8) for s in seeds]))
    pk_d, priv_d = jax.jit(ed25519.create_keypair)(arr)
    msgs = jnp.broadcast_to(
        jnp.asarray(np.frombuffer(MSG, np.uint8)), (3, 16))
    sig_d = jax.jit(ed25519.sign)(priv_d, msgs)
    for i, s in enumerate(seeds):
        pk_w, priv_w = rm.ed_keypair(s)
        assert bytes(np.asarray(pk_d[i]).tolist()) == pk_w
        sig_w = rm.ed_sign(priv_w, MSG)
        assert bytes(np.asarray(sig_d[i]).tolist()) == sig_w
        if nb is not None:
            assert nb.ed25519_keypair(s)[0] == pk_w
            assert nb.ed25519_sign(priv_w, MSG) == sig_w
