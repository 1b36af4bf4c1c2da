"""Ed25519 keygen / sign / verify (batched, TPU-native).

Protocol layer equivalent to the reference API (reference:
source/ed25519_sign.c:343-419, source/ed25519_verify.c:163-313,
include/ed25519_signature.h). Differences by design:

- Everything is batched: keys/messages/signatures carry leading batch axes;
  one call = thousands of signature ops on a chip.
- The per-pubkey precompute (Verify_Init's 16-entry q_table of subset sums of
  2^(64i) * (-Q), ed25519_verify.c:179-232) is a first-class cacheable array
  pytree, serializable like the reference's EDP_SIGV_CTX.
- Table lookups in the double-scalar multiply are constant-time one-hot
  contractions (see models/tables.py) even though verify operates on public
  data — uniformity is free here.
- Messages are fixed-shape padded byte tensors with explicit lengths
  (see ops/sha512.py).

Note on verification semantics: like the reference (which never range-checks
S, ed25519_verify.c:287-313), `strict=False` accepts signatures with
S >= l (malleable encodings). Pass strict=True for RFC 8032 semantics.

Decode semantics (frozen by tests/test_edge_encodings.py, matching the
reference's ecp_DecodeInt, source/curve25519_utils.c:100-123):
- A compressed y >= p decodes as y - p; canonicity is never enforced.
- x = 0 with sign bit 1 is accepted (negation of zero is zero).
- Small-order and identity public keys are accepted (no cofactor checks,
  same as the reference — callers needing SUF-CMA must pre-screen keys).
- R' vs R comparison is memcmp on ENCODINGS (ed25519_verify.c:310-312):
  a signature whose R bytes are non-canonical never verifies.
"""

import jax
import jax.numpy as jnp

from curve25519_tpu.config import ED_D, ED_DI, NLIMBS
from curve25519_tpu.models import edwards, tables
from curve25519_tpu.ops import codec, fe, fold, sc
from curve25519_tpu.ops.sha512 import sha512

__all__ = [
    "create_keypair", "sign", "verify", "verify_init", "verify_check",
    "verify_tablefree", "calculate_x", "unpack_point",
    "sign_ragged", "verify_ragged",
]


# ---------------------------------------------------------------------------
# Point decompression
# ---------------------------------------------------------------------------
def calculate_x(y, parity):
    """x from y with given parity bit; returns (x_limbs, ok_mask).
    Reference ed25519_CalculateX (ed25519_verify.c:66-100):
    x = sqrt((y^2 - 1)/(d y^2 + 1)) with sqrt(-1) fixup and parity match."""
    y2 = fe.sqr(y)
    u = fe.sub(y2, fe.one(y.shape[:-1]))
    v = fe.add(fe.mul(y2, fe.from_int(ED_D)), fe.one(y.shape[:-1]))
    x, ok = fe.sqrt_ratio(u, v)
    xc = fe.canon(x)
    flip = ((xc[..., 0] ^ parity) & 1) == 1
    x = fe.select(flip, fe.neg(xc), xc)
    return x, ok


def unpack_point(p_bytes, negate=False):
    """Compressed 32 bytes -> Ext point (+ok mask). negate=True yields -Q
    (parity inverted), the form Verify_Init caches (ed25519_verify.c:193)."""
    y_bytes, parity = codec.unpack_parity(jnp.asarray(p_bytes, jnp.uint8))
    if negate:
        parity = 1 - parity
    y = fe.from_bytes(y_bytes)
    x, ok = calculate_x(y, parity)
    return {"x": x, "y": y, "z": fe.vary_like(fe.one(y.shape[:-1]), y),
            "t": fe.mul(x, y)}, ok


def _pack(x, y):
    """Affine limb coords -> compressed 32 bytes (reference ed25519_PackPoint)."""
    parity = fe.canon(x)[..., 0] & 1
    return codec.pack_point(fe.to_bytes(y), parity)


# ---------------------------------------------------------------------------
# Base-point multiply with optional blinding
# ---------------------------------------------------------------------------
def _base_mult_blinded(a_limbs, blinding):
    """R = a*G as an Ext point; with blinding computes (a + bl)*G + BP
    (reference edp_BasePointMultiply, ed25519_sign.c:246-268)."""
    if blinding is not None:
        t = sc.add(sc.mod(a_limbs), blinding["bl"])
        s = edwards.base_point_mult(fold.cut8_limbs(t), zr=blinding["zr"])
        s = edwards.add_pe(s, blinding["bp"])
    else:
        from curve25519_tpu.models.blinding import default_zr
        s = edwards.base_point_mult(fold.cut8_limbs(a_limbs),
                                    zr=default_zr(a_limbs.shape[:-1]))
    return s


def _base_mult_pk(a_limbs, blinding):
    """enc(a*G) — compressed point bytes [..., 32] (with optional blinding:
    enc((a + bl)*G + BP)). a_limbs must be NORMALIZED limbs (fe.from_bytes
    outputs / canonical sc values). The Pallas path extracts the fold digits
    straight from the limbs and packs the point IN-KERNEL, so nothing but
    bytes crosses the kernel boundary (the r3 glue fix); the portable path
    is the jnp twin with identical output."""
    from curve25519_tpu.ops.pallas import use_pallas
    if blinding is not None:
        t = sc.add(sc.mod(a_limbs), blinding["bl"])
        cut = fold.cut8_limbs(t)
    else:
        cut = fold.cut8_limbs(a_limbs)
    if use_pallas(a_limbs.shape[:-1]):
        from curve25519_tpu.models.blinding import default_zr
        from curve25519_tpu.ops.pallas import edwards_kernel
        if blinding is not None:
            return edwards_kernel.base_mult_pallas(
                cut, zr=blinding["zr"], bp=blinding["bp"], mode="pk")
        return edwards_kernel.base_mult_pallas(cut, zr=default_zr(),
                                               mode="pk")
    s = _base_mult_blinded(a_limbs, blinding)
    x, y = edwards.to_affine(s)
    return _pack(x, y)


# ---------------------------------------------------------------------------
# Keygen / sign
# ---------------------------------------------------------------------------
def create_keypair(sk, blinding=None):
    """(pubkey[...,32], privkey[...,64]) from 32-byte secret seeds.
    Reference ed25519_CreateKeyPair (ed25519_sign.c:344-367).

    On the TPU path (no blinding) the whole derivation — SHA-512, clamp,
    fold cut, folding base mult, point compression — is ONE fused kernel
    launch (ops/pallas/sign_kernel.py); the multi-launch composition below
    is its bit-exact jnp twin and the blinded route."""
    from curve25519_tpu.ops.pallas import use_pallas
    sk = jnp.asarray(sk, dtype=jnp.uint8)
    if use_pallas(sk.shape[:-1]):
        from curve25519_tpu.models.blinding import default_zr
        from curve25519_tpu.ops.pallas import sign_kernel
        if blinding is None:
            pk = sign_kernel.keygen_fused_pallas(sk, zr=default_zr())
        else:
            pk = sign_kernel.keygen_fused_pallas(
                sk, zr=blinding["zr"], bl=blinding["bl"], bp=blinding["bp"])
        return pk, jnp.concatenate([sk, pk], axis=-1)
    md = sha512(sk)                              # [..., 64]
    a_bytes = codec.clamp(md[..., :32])
    a = fe.from_bytes(a_bytes)
    pk = _base_mult_pk(a, blinding)
    priv = jnp.concatenate([sk, pk], axis=-1)
    return pk, priv


def sign(priv, msg, msg_len=None, blinding=None):
    """64-byte signatures (R, S) for messages.
    priv: [..., 64] (sk || pk); msg: [..., L] uint8; msg_len: [...] int32.
    Reference ed25519_SignMessage (ed25519_sign.c:372-419)."""
    priv = jnp.asarray(priv, dtype=jnp.uint8)
    msg = jnp.asarray(msg, dtype=jnp.uint8)
    batch = msg.shape[:-1]
    L = msg.shape[-1]
    if msg_len is None:
        msg_len = jnp.full(batch, L, jnp.int32)

    # TPU fast path: the whole protocol (3 SHA-512 runs, digest reduction
    # mod l, fold cut, base mult, S = h*a + r) in ONE kernel launch, for
    # messages within the fused VMEM block budget; bit-exact with the
    # composition below (tests/test_pallas_kernels.py)
    from curve25519_tpu.ops.pallas import use_pallas
    if use_pallas(batch):
        from curve25519_tpu.ops.pallas import sign_kernel
        if sign_kernel.max_fused_msg_len(L):
            from curve25519_tpu.models.blinding import default_zr
            if blinding is None:
                return sign_kernel.sign_fused_pallas(
                    priv, msg, msg_len, zr=default_zr())
            return sign_kernel.sign_fused_pallas(
                priv, msg, msg_len, zr=blinding["zr"],
                bl=blinding["bl"], bp=blinding["bp"])

    md = sha512(priv[..., :32])
    a = fe.from_bytes(codec.clamp(md[..., :32]))
    prefix = md[..., 32:]

    # r = H(prefix || m) mod l — the fixed 32-byte header rides the
    # sha512 `prefix` argument (word-domain assembly on TPU, PERF.md §5)
    r = sc.from_digest(sha512(
        msg, msg_len, prefix=jnp.broadcast_to(prefix, batch + (32,))))

    # R = r*G
    R_bytes = _base_mult_pk(r, blinding)

    # S = r + H(enc(R) || pk || m) * a  mod l
    hpfx = jnp.concatenate([
        jnp.broadcast_to(R_bytes, batch + (32,)),
        jnp.broadcast_to(priv[..., 32:64], batch + (32,))], -1)
    h = sc.from_digest(sha512(msg, msg_len, prefix=hpfx))
    s = sc.muladd(h, sc.mod(a), r)
    return jnp.concatenate([jnp.broadcast_to(R_bytes, batch + (32,)),
                            sc.to_bytes(s)], axis=-1)


# ---------------------------------------------------------------------------
# Verify (two-phase, amortizable per-pk precompute)
# ---------------------------------------------------------------------------
def verify_init(pk):
    """Build the per-pubkey context: q_table[16] of subset sums of
    {-Q, 2^64(-Q), 2^128(-Q), 2^192(-Q)} in PE form.
    Reference ed25519_Verify_Init (ed25519_verify.c:179-232).

    Returns a pytree dict {pk, planes, ok}; `planes` is the int8-split table
    ready for constant-time gathering, shape [..., 16, 8*NLIMBS]."""
    pk = jnp.asarray(pk, dtype=jnp.uint8)
    batch = pk.shape[:-1]

    from curve25519_tpu.ops.pallas import use_pallas
    if use_pallas(batch):
        from curve25519_tpu.ops.pallas import verify_kernel
        y_bytes, parity = codec.unpack_parity(pk)
        arr, ok = verify_kernel.verify_init_pallas(
            fe.from_bytes(y_bytes), 1 - parity)
        # the kernel canonicalizes in-kernel; only the elementwise int8
        # split remains outside
        return {"pk": pk, "planes": tables.pe_planes_from_canonical(arr),
                "ok": ok}

    q, ok = unpack_point(pk, negate=True)

    qt = [None] * 16
    qt[0] = {"ypx": fe.one(batch), "ymx": fe.one(batch),
             "t2d": fe.zero(batch), "z2": fe.from_int(2, batch)}
    qt[1] = edwards.to_pe(q)

    def dbl64(_, p):
        return edwards.double(p)

    q = jax.lax.fori_loop(0, 64, dbl64, q)
    qt[2] = edwards.to_pe(q)
    qt[3] = edwards.to_pe(edwards.add_pe(q, qt[1]))

    q = jax.lax.fori_loop(0, 64, dbl64, q)
    qt[4] = edwards.to_pe(q)
    for d, s in [(5, 1), (6, 2), (7, 3)]:
        qt[d] = edwards.to_pe(edwards.add_pe(q, qt[s]))

    q = jax.lax.fori_loop(0, 64, dbl64, q)
    qt[8] = edwards.to_pe(q)
    for d, s in [(9, 1), (10, 2), (11, 3), (12, 4), (13, 5), (14, 6), (15, 7)]:
        qt[d] = edwards.to_pe(edwards.add_pe(q, qt[s]))

    arr = jnp.stack([
        jnp.stack([e["ypx"], e["ymx"], e["t2d"], e["z2"]], axis=-2)
        for e in qt], axis=-3)                    # [..., 16, 4, NLIMBS]
    return {"pk": pk, "planes": tables.pe_planes_from_array(arr), "ok": ok}


def _poly_point_multiply(u, v, planes):
    """R' = s*G + h*(-Q): 8-fold digits u of s against the base table
    interleaved with 4-fold digits v of h against the per-key q_table.
    Reference edp_PolyPointMultiply (ed25519_verify.c:243-280)."""
    q0 = tables.gather_pe(v[..., 0], planes)
    x = fe.sub(q0["ypx"], q0["ymx"])
    y = fe.add(q0["ypx"], q0["ymx"])
    t = fe.mul(q0["t2d"], fe.from_int(ED_DI))
    s = {"x": x, "y": y, "z": q0["z2"], "t": t}

    v1 = jnp.moveaxis(v[..., 1:32], -1, 0)       # [31, ...]

    def body1(st, vi):
        st = edwards.double(st)
        st = edwards.add_pe(st, tables.gather_pe(vi, planes))
        return st, None

    s, _ = jax.lax.scan(body1, s, v1)

    u2 = jnp.moveaxis(u, -1, 0)                  # [32, ...]
    v2 = jnp.moveaxis(v[..., 32:], -1, 0)        # [32, ...]

    def body2(st, uv):
        ui, vi = uv
        st = edwards.double(st)
        st = edwards.add_pa(st, tables.gather_pa(ui))
        st = edwards.add_pe(st, tables.gather_pe(vi, planes))
        return st, None

    s, _ = jax.lax.scan(body2, s, (u2, v2))
    return edwards.to_affine(s)


def verify_check(ctx, sig, msg, msg_len=None, strict=False):
    """Per-message phase: recompute R' = s*G + h*(-Q) and compare with the
    signature's R. Reference ed25519_Verify_Check (ed25519_verify.c:287-313).
    Returns a boolean batch mask."""
    sig = jnp.asarray(sig, dtype=jnp.uint8)
    msg = jnp.asarray(msg, dtype=jnp.uint8)
    batch = jnp.broadcast_shapes(msg.shape[:-1], sig.shape[:-1],
                                 ctx["pk"].shape[:-1])
    L = msg.shape[-1]
    if msg_len is None:
        msg_len = jnp.full(batch, L, jnp.int32)

    hpfx = jnp.concatenate([
        jnp.broadcast_to(sig[..., :32], batch + (32,)),
        jnp.broadcast_to(ctx["pk"], batch + (32,))], -1)
    h = sc.from_digest(sha512(
        jnp.broadcast_to(msg, batch + (L,)), msg_len, prefix=hpfx))

    # fold digits straight from the encodings: s from the signature bytes,
    # h from its canonical limbs — no bit-tensor/byte round-trips
    u = fold.cut8_bytes(sig[..., 32:])
    v = fold.cut4_limbs(h)
    from curve25519_tpu.ops.pallas import use_pallas
    if use_pallas(batch):
        from curve25519_tpu.ops.pallas import verify_kernel
        # an unbatched ctx (one pk, many messages) stays unbatched: the
        # kernel then ships the q_table once as a shared MXU operand
        # instead of broadcasting 2.5 KB of planes per lane through HBM
        planes = ctx["planes"]
        if planes.ndim != 2:
            planes = jnp.broadcast_to(planes, batch + planes.shape[-2:])
        r_bytes = verify_kernel.poly_mult_pallas(
            jnp.broadcast_to(u, batch + (32,)),
            jnp.broadcast_to(v, batch + (64,)), planes)
    else:
        rx, ry = _poly_point_multiply(
            jnp.broadcast_to(u, batch + (32,)),
            jnp.broadcast_to(v, batch + (64,)), ctx["planes"])
        r_bytes = _pack(rx, ry)

    match = jnp.all(r_bytes == sig[..., :32], axis=-1)
    result = jnp.logical_and(match, ctx["ok"])
    if strict:
        # RFC 8032: reject S >= l (the reference accepts malleable encodings)
        s_red = sc.mod(fe.from_bytes(sig[..., 32:]))
        canonical = jnp.all(sc.to_bytes(s_red) == sig[..., 32:], axis=-1)
        result = jnp.logical_and(result, canonical)
    return result


def verify(sig, pk, msg, msg_len=None, strict=False):
    """One-shot verify. Reference ed25519_VerifySignature
    (ed25519_verify.c:163-173).

    On the TPU path this is a single FUSED kernel launch (decompress +
    192-double q_table build + poly multiply + point compression) — the
    q_table never leaves VMEM, where the two-phase route materializes
    [B, 16, 160] int8 planes through HBM between two launches. Callers
    amortizing one pubkey over many messages should still use
    verify_init/verify_check. The portable path composes the two phases."""
    from curve25519_tpu.ops.pallas import use_pallas
    sig = jnp.asarray(sig, dtype=jnp.uint8)
    pk = jnp.asarray(pk, dtype=jnp.uint8)
    msg = jnp.asarray(msg, dtype=jnp.uint8)
    batch = jnp.broadcast_shapes(msg.shape[:-1], sig.shape[:-1],
                                 pk.shape[:-1])
    if not use_pallas(batch):
        return verify_check(verify_init(pk), sig, msg, msg_len=msg_len,
                            strict=strict)

    from curve25519_tpu.ops.pallas import verify_kernel
    L = msg.shape[-1]
    if msg_len is None:
        msg_len = jnp.full(batch, L, jnp.int32)
    hpfx = jnp.concatenate([
        jnp.broadcast_to(sig[..., :32], batch + (32,)),
        jnp.broadcast_to(pk, batch + (32,))], -1)
    h = sc.from_digest(sha512(
        jnp.broadcast_to(msg, batch + (L,)), msg_len, prefix=hpfx))
    u = jnp.broadcast_to(fold.cut8_bytes(sig[..., 32:]), batch + (32,))
    v = fold.cut4_limbs(h)
    y_bytes, parity = codec.unpack_parity(jnp.broadcast_to(pk,
                                                           batch + (32,)))
    r_bytes, ok = verify_kernel.verify_oneshot_pallas(
        fe.from_bytes(y_bytes), 1 - parity, u, v)
    match = jnp.all(r_bytes == jnp.broadcast_to(sig[..., :32],
                                                batch + (32,)), axis=-1)
    result = jnp.logical_and(match, ok)
    if strict:
        s_red = sc.mod(fe.from_bytes(sig[..., 32:]))
        canonical = jnp.all(sc.to_bytes(s_red) == sig[..., 32:], axis=-1)
        result = jnp.logical_and(result, canonical)
    return result


def _select_point(mask, a, b):
    return {k: fe.select(mask != 0, a[k], b[k]) for k in a}


def verify_tablefree(sig, pk, msg, msg_len=None, strict=False):
    """Table-free verification oracle: R' = s*G + h*(-Q) by plain MSB-first
    double-and-add over the raw scalar bits — no folding cuts, no q_table,
    no precomputed tables beyond the base point itself (G's PA form is built
    straight from the curve constants, independent of the folding-table
    generator). Reference alt_ed25519_VerifySignature
    (test/curve25519_selftest.c:881-912), which exists for the same reason:
    an independent, structurally different verify to cross-check the folded
    fast paths against. `strict=True` applies the same RFC 8032 S < l check
    as verify_check so the oracle covers both semantics."""
    sig = jnp.asarray(sig, dtype=jnp.uint8)
    pk = jnp.asarray(pk, dtype=jnp.uint8)
    msg = jnp.asarray(msg, dtype=jnp.uint8)
    batch = jnp.broadcast_shapes(msg.shape[:-1], sig.shape[:-1],
                                 pk.shape[:-1])
    L = msg.shape[-1]
    if msg_len is None:
        msg_len = jnp.full(batch, L, jnp.int32)

    hmsg = jnp.concatenate([
        jnp.broadcast_to(sig[..., :32], batch + (32,)),
        jnp.broadcast_to(pk, batch + (32,)),
        jnp.broadcast_to(msg, batch + (L,))], -1)
    h = sc.from_digest(sha512(hmsg, 64 + msg_len))

    q, ok = unpack_point(jnp.broadcast_to(pk, batch + (32,)), negate=True)
    q_pe = edwards.to_pe(q)

    # G in PA form straight from the curve constants (not via the folding
    # table machinery, so this oracle stays independent of it)
    from curve25519_tpu.config import ED_2D, ED_BX, ED_BY, P, int_to_limbs
    bx, by = ED_BX, ED_BY
    g_pa = {"ypx": fe.vary_like(jnp.asarray(int_to_limbs((by + bx) % P)),
                                q["y"]),
            "ymx": fe.vary_like(jnp.asarray(int_to_limbs((by - bx) % P)),
                                q["y"]),
            "t2d": fe.vary_like(jnp.asarray(int_to_limbs(ED_2D * bx * by % P)),
                                q["y"])}

    s_bits = jnp.broadcast_to(
        codec.scalar_bits(sig[..., 32:]), batch + (256,))
    h_bits = jnp.broadcast_to(
        codec.scalar_bits(sc.to_bytes(h)), batch + (256,))
    # MSB-first scan over the 256 bit positions
    sb = jnp.moveaxis(s_bits, -1, 0)[::-1]
    hb = jnp.moveaxis(h_bits, -1, 0)[::-1]

    st = {k: fe.vary_like(v, q["y"])
          for k, v in edwards.identity_ext(()).items()}

    def body(st, bits):
        sbit, hbit = bits
        st = edwards.double(st)
        st = _select_point(sbit, edwards.add_pa(st, g_pa), st)
        st = _select_point(hbit, edwards.add_pe(st, q_pe), st)
        return st, None

    st, _ = jax.lax.scan(body, st, (sb, hb))
    rx, ry = edwards.to_affine(st)
    r_bytes = _pack(rx, ry)
    result = jnp.logical_and(
        jnp.all(r_bytes == jnp.broadcast_to(sig[..., :32], batch + (32,)),
                axis=-1), ok)
    if strict:
        s_red = sc.mod(fe.from_bytes(sig[..., 32:]))
        canonical = jnp.all(sc.to_bytes(s_red) == sig[..., 32:], axis=-1)
        result = jnp.logical_and(result, canonical)
    return result


# ---------------------------------------------------------------------------
# Ragged (mixed-length) batches: bucket by SHA-512 block count so a batch of
# wildly different message lengths costs one compile per distinct block
# count and no lane hashes padding blocks for other lanes' lengths (the
# fixed-shape answer to the reference's streaming Update/Final,
# source/sha512.c:118-157; see utils/bucketing.py).
# ---------------------------------------------------------------------------
_sign_jit = None
_sign_blinded_jit = None
_vcheck_jit = None


def sign_ragged(priv, msgs, blinding=None):
    """Sign a ragged batch: priv [N, 64] (or broadcastable), msgs a list of
    bytes-like objects. Returns [N, 64] uint8 signatures in input order."""
    global _sign_jit, _sign_blinded_jit
    from curve25519_tpu.utils import bucketing
    priv = jnp.asarray(priv, jnp.uint8)
    priv = jnp.broadcast_to(priv, (len(msgs), 64))
    if _sign_jit is None:
        _sign_jit = jax.jit(lambda m, l, p: sign(p, m, l))
    if blinding is None:
        return bucketing.apply_bucketed(_sign_jit, msgs, priv)
    # blinding enters as a traced pytree argument so repeat calls (same
    # bucket shapes, any blinder values) hit the jit cache instead of
    # compiling a fresh closure per invocation
    if _sign_blinded_jit is None:
        _sign_blinded_jit = jax.jit(lambda m, l, p, bl: sign(
            p, m, l, blinding=jax.tree_util.tree_map(
                lambda v: jnp.broadcast_to(v, m.shape[:1] + v.shape[-1:]),
                bl)))
    return bucketing.apply_bucketed(
        lambda m, l, p: _sign_blinded_jit(m, l, p, blinding), msgs, priv)


def verify_ragged(sig, pk, msgs, strict=False, ctx=None):
    """Verify a ragged batch: sig [N, 64]; pk [32] (one key) or [N, 32];
    msgs a list of bytes-like objects. Returns [N] bool in input order.

    Two-phase amortization (the point of the reference's Verify_Init/Check
    split, ed25519_verify.c:179-232): `verify_init` runs EXACTLY ONCE for
    the whole ragged batch — not once per length bucket — or ZERO times
    when a precomputed `ctx` (from verify_init) is passed. A rank-1 pk (or
    an unbatched ctx) keeps the shared-MXU-operand q_table fast path for
    every bucket."""
    global _vcheck_jit
    from curve25519_tpu.utils import bucketing
    n = len(msgs)
    sig = jnp.broadcast_to(jnp.asarray(sig, jnp.uint8), (n, 64))
    if ctx is None:
        ctx = verify_init(jnp.asarray(pk, jnp.uint8))
    if _vcheck_jit is None:
        _vcheck_jit = jax.jit(
            lambda m, l, s, planes, ok, pkb, strict: verify_check(
                {"pk": pkb, "planes": planes, "ok": ok}, s, m, l,
                strict=strict),
            static_argnums=(6,))
    if ctx["planes"].ndim == 2:          # one pk shared by every bucket
        return bucketing.apply_bucketed(
            lambda m, l, s: _vcheck_jit(m, l, s, ctx["planes"], ctx["ok"],
                                        ctx["pk"], strict), msgs, sig)
    return bucketing.apply_bucketed(
        lambda m, l, s, planes, ok, pkb: _vcheck_jit(
            m, l, s, planes, ok, pkb, strict),
        msgs, sig, ctx["planes"], ctx["ok"], ctx["pk"])


def verify_finish(ctx):
    """Release a verify context's device buffers (reference
    ed25519_Verify_Finish, include/ed25519_signature.h:93 — there it frees
    the malloc'd EDP_SIGV_CTX; here it deletes the on-device arrays so HBM
    is reclaimed without waiting for the GC). The "pk" entry aliases the
    caller's own key array (verify_init does not copy it) and is left
    alone — the reference likewise never frees the caller's key."""
    for k, v in ctx.items():
        if k != "pk" and hasattr(v, "delete"):
            v.delete()
