"""Full benchmark suite — one JSON line per BASELINE.json config.

Mirrors the reference speed_test discipline (test/curve25519_test.c:130-321):
compile/warm first, then best-of-rounds over N independent dispatches closed
by a host fetch of the LAST result (the axon tunnel's block_until_ready
returns early; single-device FIFO execution means the fetch bounds all N).

Usage:  python benchmarks/bench_suite.py [--batch 65536] [--quick]

Baselines are the reference's single-core numbers normalized to ops/s
(BASELINE.md); `vs_baseline` is per-chip speedup over one x86 core.
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BASELINES = {
    "x25519_shared_secret": 12_549.0,     # CreateSharedKey, OpenSSL-test box
    "x25519_public_key_fast": 70_000.0,   # 8-fold keygen @3.4GHz MASM
    "ed25519_keygen": 70_000.0,
    "ed25519_sign": 63_000.0,
    "ed25519_sign_blinded": 61_000.0,     # 55,741 cycles (B) @3.4GHz
    "ed25519_verify_init": 26_800.0,      # 126,880 cycles @3.4GHz
    "ed25519_verify_check": 32_900.0,     # 103,392 cycles @3.4GHz
    "ed25519_verify_oneshot": 14_800.0,   # init+check per op
    "sha512_64b": 150_000.0,              # ~order-of a fast scalar impl
    "mixed_dh_sign_verify": 20_000.0,     # blended single-core estimate
    "x25519_single_call_latency": 12_549.0,  # 1/latency vs one ref call
    "x25519_public_key_fold4": 70_000.0,     # same anchor as the 8-fold row
    "x25519_public_key_ladder": 10_758.0,    # 316,096 cycles @3.4GHz
    "ed25519_verify_check_shared": 32_900.0,  # same anchor as verify_check
    # long-message hashing in bytes/s: the reference's portable-C SHA-512
    # (source/sha512.c) sustains ~2e8 B/s on one core (80-round scalar
    # transform at ~12 cycles/byte @ 3.4 GHz — README-class hardware)
    "sha512_long": 2.0e8,
}


def bench_chain(fn, args, reps=6, rounds=3):
    """Best-of-rounds seconds/call — thin shim over the repo's single
    timing helper (utils/profiling.bench: `reps` independent dispatches per
    round closed by a host fetch of the last result)."""
    from curve25519_tpu.utils.profiling import bench
    return bench(fn, *args, reps=reps, rounds=rounds)


def emit(metric, ops_per_s, extra=None):
    d = {"metric": metric, "value": round(ops_per_s, 1), "unit": "ops/s",
         "vs_baseline": round(ops_per_s / BASELINES[metric], 3)}
    if extra:
        d.update(extra)
    print(json.dumps(d), flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=65536)
    ap.add_argument("--quick", action="store_true",
                    help="small batch, fewer reps (smoke run)")
    args = ap.parse_args()
    B = 8192 if args.quick else args.batch
    reps = 3 if args.quick else 6

    import jax
    import jax.numpy as jnp
    from curve25519_tpu.models import blinding, ed25519, x25519
    from curve25519_tpu.ops.sha512 import sha512

    rng = np.random.default_rng(0)
    sk = jnp.asarray(rng.integers(0, 256, (B, 32), dtype=np.uint8))
    peer = jnp.asarray(rng.integers(0, 256, (B, 32), dtype=np.uint8))
    seed = jnp.asarray(rng.integers(0, 256, (B, 32), dtype=np.uint8))
    msg = jnp.asarray(rng.integers(0, 256, (B, 64), dtype=np.uint8))
    mlen = jnp.full((B,), 64, jnp.int32)

    # correctness gate: every op's device output is checked against the
    # host oracle on a slice of lanes BEFORE being timed (the reference
    # won't benchmark until donna matches, test/curve25519_test.c:143-154)
    from correctness_gate import Oracle, check_rows
    orc = Oracle()
    NV = 4
    skb = [bytes(np.asarray(sk[i])) for i in range(NV)]
    peerb = [bytes(np.asarray(peer[i])) for i in range(NV)]
    seedb = [bytes(np.asarray(seed[i])) for i in range(NV)]
    msgb = [bytes(np.asarray(msg[i])) for i in range(NV)]
    ver = {"verified": True, "oracle": orc.label}

    # config 1: X25519 DH shared secret (ladder kernel)
    f = jax.jit(x25519.create_shared_key)
    check_rows("x25519_shared_secret", np.asarray(f(peer, sk))[:NV],
               [orc.x25519(skb[i], peerb[i]) for i in range(NV)])
    emit("x25519_shared_secret", B / bench_chain(f, (peer, sk), reps),
         {"batch": B, **ver})

    # single-call latency: the reference's single-op regime
    # (CreateSharedKey ~80 us on one core, README.md:123-125). Single-key
    # calls route through the native C++ host core (oo.py) — a device
    # round trip costs the ~3 ms tunnel floor regardless of batch, so the
    # host path owns this regime. value = 1/latency of one host-path call.
    import time as _time
    from curve25519_tpu import oo
    priv1 = oo.X25519Private(bytes(np.asarray(sk[0])))
    peer1 = bytes(np.asarray(peer[0]))
    priv1.create_shared_key(peer1, kdf=False)        # warm (lib load)
    n1 = 2000
    t0 = _time.perf_counter()
    for _ in range(n1):
        priv1.create_shared_key(peer1, kdf=False)
    t1 = (_time.perf_counter() - t0) / n1
    # device-path small-batch latencies, for the routing-cliff record
    td1 = bench_chain(f, (peer[:1], sk[:1]), reps)
    t1k = bench_chain(f, (peer[:1024], sk[:1024]), reps)
    emit("x25519_single_call_latency", 1.0 / t1,
         {"batch": 1, "path": "native-host", "latency_us": round(t1 * 1e6, 2),
          "device_batch1_ms": round(td1 * 1e3, 3),
          "device_batch1024_ms": round(t1k * 1e3, 3)})

    # config 3: 8-fold base-point multiply (folding kernel)
    base_want = [orc.x25519_base(skb[i]) for i in range(NV)]
    f = jax.jit(x25519.calculate_public_key_fast)
    check_rows("x25519_public_key_fast", np.asarray(f(sk))[:NV], base_want)
    emit("x25519_public_key_fast", B / bench_chain(f, (sk,), reps),
         {"batch": B, **ver})
    # the plain-ladder CalculatePublicKey route (reference
    # curve25519_dh.c:192-198), now also on the Pallas ladder kernel
    fl = jax.jit(x25519.calculate_public_key)
    check_rows("x25519_public_key_ladder", np.asarray(fl(sk))[:NV], base_want)
    emit("x25519_public_key_ladder", B / bench_chain(fl, (sk,), reps),
         {"batch": B, **ver})
    # 4-fold variant: 16-entry table, 62 doubles + 63 adds (the reference's
    # memory/speed tradeoff pair, curve25519_utils.c:125-153)
    f4 = jax.jit(lambda s: x25519.calculate_public_key_fast(s, nfolds=4))
    check_rows("x25519_public_key_fold4", np.asarray(f4(sk))[:NV], base_want)
    emit("x25519_public_key_fold4", B / bench_chain(f4, (sk,), reps),
         {"batch": B, **ver})

    # config 2: Ed25519 keygen + sign (+ SHA-512 kernel)
    kp_want = [orc.ed_keypair(seedb[i]) for i in range(NV)]
    f = jax.jit(ed25519.create_keypair)
    pk_d, priv_d = f(seed)
    check_rows("ed25519_keygen[pk]", np.asarray(pk_d)[:NV],
               [w[0] for w in kp_want])
    check_rows("ed25519_keygen[priv]", np.asarray(priv_d)[:NV],
               [w[1] for w in kp_want])
    emit("ed25519_keygen", B / bench_chain(f, (seed,), reps),
         {"batch": B, **ver})
    pk, priv = ed25519.create_keypair(seed)
    sig_want = [orc.ed_sign(kp_want[i][1], msgb[i]) for i in range(NV)]
    f = jax.jit(ed25519.sign)
    check_rows("ed25519_sign", np.asarray(f(priv, msg, mlen))[:NV], sig_want)
    emit("ed25519_sign", B / bench_chain(f, (priv, msg, mlen), reps),
         {"batch": B, **ver})
    bctx = blinding.as_batch(blinding.blinding_init(b"bench-blinder"), (B,))
    fb = jax.jit(lambda p, m, l: ed25519.sign(p, m, l, blinding=bctx))
    # blinding must not change the signature (test/curve25519_test.c:323-410)
    check_rows("ed25519_sign_blinded", np.asarray(fb(priv, msg, mlen))[:NV],
               sig_want)
    emit("ed25519_sign_blinded",
         B / bench_chain(fb, (priv, msg, mlen), reps), {"batch": B, **ver})
    f = jax.jit(sha512)
    check_rows("sha512_64b", np.asarray(f(msg, mlen))[:NV],
               [orc.sha512(msgb[i]) for i in range(NV)])
    emit("sha512_64b", B / bench_chain(f, (msg, mlen), reps),
         {"batch": B, **ver})

    # config 4: Ed25519 batch verify, two-phase and one-shot
    sig = ed25519.sign(priv, msg, mlen)
    f = jax.jit(ed25519.verify_init)
    emit("ed25519_verify_init", B / bench_chain(f, (pk,), reps),
         {"batch": B, **ver})   # verified transitively via verify_check below
    ctx = ed25519.verify_init(pk)
    f = jax.jit(lambda s, m, l: ed25519.verify_check(ctx, s, m, l))
    # gate: all valid lanes accept, a tampered lane rejects
    ok = np.asarray(f(sig, msg, mlen))
    bad_sig = sig.at[0, 0].set(sig[0, 0] ^ 1)
    ok_bad = np.asarray(f(bad_sig, msg, mlen))
    if not (ok.all() and not ok_bad[0] and ok_bad[1:].all()):
        raise AssertionError("verify_check gate failed: "
                             f"valid={ok.all()} tampered={ok_bad[0]}")
    emit("ed25519_verify_check", B / bench_chain(f, (sig, msg, mlen), reps),
         {"batch": B, **ver})
    f = jax.jit(ed25519.verify)
    ok = np.asarray(f(sig, pk, msg, mlen))
    if not ok.all():
        raise AssertionError("verify oneshot gate failed")
    emit("ed25519_verify_oneshot",
         B / bench_chain(f, (sig, pk, msg, mlen), reps), {"batch": B, **ver})

    # shared-pk fast path: ONE pubkey's q_table amortized over the whole
    # batch (the point of Verify_Init, ed25519_verify.c:179-232) — the
    # unbatched ctx ships the table once as a shared MXU operand instead of
    # 2.5 KB per lane
    sig_sh = ed25519.sign(jnp.broadcast_to(priv[:1], (B, 64)), msg, mlen)
    ctx_sh = ed25519.verify_init(pk[0])          # rank-1 pk -> shared ctx
    assert ctx_sh["planes"].ndim == 2
    f = jax.jit(lambda s, m, l: ed25519.verify_check(ctx_sh, s, m, l))
    ok = np.asarray(f(sig_sh, msg, mlen))
    bad_sig = sig_sh.at[0, 0].set(sig_sh[0, 0] ^ 1)
    ok_bad = np.asarray(f(bad_sig, msg, mlen))
    if not (ok.all() and not ok_bad[0] and ok_bad[1:].all()):
        raise AssertionError("shared-pk verify gate failed")
    emit("ed25519_verify_check_shared",
         B / bench_chain(f, (sig_sh, msg, mlen), reps),
         {"batch": B, "note": "1 pk x B msgs, shared MXU q_table", **ver})

    # long-message SHA-512: the chunked kernel streams CHUNK_BLOCKS-block
    # chunks, so VMEM holds O(chunk) while messages are 1 MiB (8193 blocks).
    # Data is generated on-device (a 1 GiB host->device push would time the
    # tunnel, not the hash); value is hashed bytes/s over actual lengths.
    Bl, Ll = 1024, 1 << 20
    key = jax.random.PRNGKey(7)
    lmsg = jax.random.randint(key, (Bl, Ll), 0, 256, jnp.uint8)
    llen = jnp.concatenate([
        jnp.asarray([0, 1, 111, Ll - 1], jnp.int32),
        jax.random.randint(jax.random.PRNGKey(8), (Bl - 5,), 0, Ll + 1,
                           jnp.int32),
        jnp.asarray([Ll], jnp.int32)])
    import hashlib as _hl
    f = jax.jit(sha512)
    dig = np.asarray(f(lmsg, llen)[:NV])
    rows = np.asarray(lmsg[:NV])
    lens_h = np.asarray(llen[:NV])
    check_rows("sha512_long", dig,
               [_hl.sha512(rows[i, :lens_h[i]].tobytes()).digest()
                for i in range(NV)])
    total_bytes = int(np.asarray(llen).astype(np.int64).sum())
    secs = bench_chain(f, (lmsg, llen), max(2, reps // 2))
    emit("sha512_long", total_bytes / secs,
         {"batch": Bl, "msg_mib": 1, "unit_note": "bytes/s",
          "total_mib": round(total_bytes / 2**20, 1), **ver})

    # config 5 (single-chip leg): mixed DH + sign + verify pipeline; the
    # multi-host form shards this over a Mesh (parallel/mesh.py,
    # __graft_entry__.dryrun_multichip)
    def mixed(sk_a, sk_b, msgs):
        pk_a = x25519.calculate_public_key_fast(sk_a)
        pk_b = x25519.calculate_public_key_fast(sk_b)
        sh = x25519.create_shared_key(pk_b, sk_a)
        pk_e, priv_e = ed25519.create_keypair(sk_a)
        lm = jnp.full(msgs.shape[:-1], msgs.shape[-1], jnp.int32)
        sg = ed25519.sign(priv_e, msgs, lm)
        ok = ed25519.verify(sg, pk_e, msgs, lm)
        return sh, jnp.sum(ok.astype(jnp.int32))

    Bm = max(B // 8, 1024)
    f = jax.jit(mixed)
    sh_d, nok = f(sk[:Bm], peer[:Bm], msg[:Bm])
    if int(nok) != Bm:
        raise AssertionError(f"mixed gate failed: {int(nok)}/{Bm} verified")
    check_rows("mixed_dh_sign_verify[shared]", np.asarray(sh_d)[:NV],
               [orc.x25519(skb[i], orc.x25519_base(peerb[i]))
                for i in range(NV)])
    secs = bench_chain(f, (sk[:Bm], peer[:Bm], msg[:Bm]), max(2, reps // 2))
    emit("mixed_dh_sign_verify", 6 * Bm / secs,
         {"batch": Bm, "note": "6 protocol ops per lane", **ver})


if __name__ == "__main__":
    main()
