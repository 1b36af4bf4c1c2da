"""Length-bucketing tests: ragged batches grouped by SHA-512 block count
(one compile per bucket), results bit-identical to per-message calls and to
hashlib (reference analogue: streaming SHA-512, source/sha512.c:118-157)."""

import hashlib

import numpy as np
import jax.numpy as jnp

from curve25519_tpu.models import ed25519
from curve25519_tpu.ops.sha512 import sha512
from curve25519_tpu.utils import bucketing

rng = np.random.default_rng(77)

# lengths spanning exactly two block counts: (len+17+127)//128
LENS = [0, 3, 111, 112, 200]          # buckets: {1: [0,1,2], 2: [3,4]}
MSGS = [rng.bytes(n) for n in LENS]


def test_bucket_indices_and_lengths():
    bk = bucketing.bucket_indices(LENS)
    assert sorted(bk.keys()) == [1, 2]
    assert bk[1].tolist() == [0, 1, 2]
    assert bk[2].tolist() == [3, 4]
    assert bucketing.bucket_length(1) == 111
    assert bucketing.bucket_length(2) == 239
    assert bucketing.nblocks(111) == 1 and bucketing.nblocks(112) == 2


def test_ragged_sha512_matches_hashlib_two_compiles():
    calls = []

    def fn(m, l):
        calls.append(m.shape[-1])
        return sha512(jnp.asarray(m), jnp.asarray(l))

    out = np.asarray(bucketing.apply_bucketed(fn, MSGS))
    assert sorted(calls) == [111, 239]        # exactly one call per bucket
    for i, m in enumerate(MSGS):
        assert bytes(out[i].tolist()) == hashlib.sha512(m).digest()


def test_sign_ragged_matches_per_message():
    seeds = jnp.asarray(rng.integers(0, 256, (len(MSGS), 32), np.uint8))
    pk, priv = ed25519.create_keypair(seeds)
    sigs = np.asarray(ed25519.sign_ragged(priv, MSGS))
    # oracle: the pure-python reference model signs every message with no
    # padding/bucketing at all (and no extra XLA compiles — per-message
    # exact-length device signs would each compile a fresh shape)
    from curve25519_tpu import refmodel
    for i, m in enumerate(MSGS):
        want = refmodel.ed_sign(bytes(np.asarray(priv[i]).tolist()), m)
        assert bytes(sigs[i].tolist()) == want
    ok = np.asarray(ed25519.verify_ragged(sigs, pk, MSGS))
    assert ok.all()
    # tampered message must fail in its own bucket
    bad = list(MSGS)
    bad[3] = bad[3][:-1] + bytes([bad[3][-1] ^ 1])
    okb = np.asarray(ed25519.verify_ragged(sigs, pk, bad))
    assert okb.tolist() == [True, True, True, False, True]


def test_verify_ragged_single_init(monkeypatch):
    """Two-phase amortization (reference ed25519_Verify_Init/Check split,
    ed25519_verify.c:179-232): ragged verify of N messages performs exactly
    ONE verify_init across all length buckets — and zero with a precomputed
    ctx. A rank-1 pk keeps the shared-operand ctx (planes ndim == 2)."""
    seed = jnp.asarray(rng.integers(0, 256, (32,), np.uint8))
    pk, priv = ed25519.create_keypair(seed)
    sigs = np.asarray(ed25519.sign_ragged(priv, MSGS))

    calls = []
    real_init = ed25519.verify_init

    def counting_init(p):
        calls.append(1)
        return real_init(p)

    monkeypatch.setattr(ed25519, "verify_init", counting_init)
    ok = np.asarray(ed25519.verify_ragged(sigs, pk, MSGS))
    assert ok.all()
    assert len(calls) == 1                      # one init, two buckets

    ctx = real_init(pk)
    assert ctx["planes"].ndim == 2              # shared-operand form
    calls.clear()
    ok2 = np.asarray(ed25519.verify_ragged(sigs, pk, MSGS, ctx=ctx))
    assert ok2.all() and len(calls) == 0        # precomputed ctx: zero inits


def test_row_args_scatter_order():
    # per-row args must follow their messages through the buckets
    tags = np.arange(len(MSGS), dtype=np.int32)

    def fn(m, l, t):
        return t * 10 + jnp.asarray(l) // 128

    out = np.asarray(bucketing.apply_bucketed(fn, MSGS, tags))
    want = [t * 10 + n // 128 for t, n in zip(tags, LENS)]
    assert out.tolist() == [int(w) for w in want]
