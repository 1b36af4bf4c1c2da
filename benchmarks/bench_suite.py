"""Full benchmark suite — one JSON line per BASELINE config.

Mirrors the reference speed_test discipline (test/curve25519_test.c:130-321):
compile/warm first, then best-of-rounds over N independent dispatches closed
by a host fetch of the LAST result (the axon tunnel's block_until_ready
returns early; single-device FIFO execution means the fetch bounds all N).

Baselines: every `vs_baseline` is read from BASELINE_LOCAL.json — the
reference built and measured ON THIS HOST by
benchmarks/measure_local_baseline.py (its own speed_test cycles at the
calibrated TSC rate, its own sha512.c timed directly, the mixed row composed
from measured per-op times). If that artifact is absent the suite falls
back to the reference README's cycle counts normalized at 3.4 GHz, and tags
each row's `baseline_src` accordingly so no number is untraceable.

Usage:  python benchmarks/bench_suite.py [--batch 65536] [--quick]
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Fallback anchors: the reference README's record cycle counts @3.4 GHz
# (README.md:70-97,115-129), used only when BASELINE_LOCAL.json is absent.
BASELINES_README = {
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
    "x25519_single_call_latency": 12_549.0,
    "x25519_public_key_fold4": 70_000.0,
    "x25519_public_key_ladder": 10_758.0,    # 316,096 cycles @3.4GHz
    "ed25519_verify_check_shared": 32_900.0,
    "ed25519_verify_check_multipk": 32_900.0,
    "sha512_long": 2.0e8,
    "ed25519_keygen_single": 231_000.0,   # 14.7 us record, README.md:70
    "ed25519_sign_single": 215_000.0,     # 15.8 us record, README.md:71
    "x25519_public_key_fast_single": 267_000.0,  # 12.7 us, README.md:86,97
}

_LOCAL = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "BASELINE_LOCAL.json")
if os.path.exists(_LOCAL):
    with open(_LOCAL) as f:
        BASELINES = json.load(f)["baselines_ops_per_s"]
    BASELINE_SRC = "measured-local-asm64"
else:
    BASELINES = BASELINES_README
    BASELINE_SRC = "readme-cycles@3.4GHz"


def bench_chain(fn, args, reps=6, rounds=3):
    """Best-of-rounds seconds/call — thin shim over the repo's single
    timing helper (utils/profiling.bench: `reps` independent dispatches per
    round closed by a host fetch of the last result)."""
    from curve25519_tpu.utils.profiling import bench
    return bench(fn, *args, reps=reps, rounds=rounds)


def bench_host(fn, n=2000):
    """Min-of-rounds host-path latency (seconds/call)."""
    import time
    fn()
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(n):
            fn()
        best = min(best, (time.perf_counter() - t0) / n)
    return best


def emit(metric, ops_per_s, extra=None):
    d = {"metric": metric, "value": round(ops_per_s, 1), "unit": "ops/s",
         "vs_baseline": round(ops_per_s / BASELINES[metric], 3),
         "baseline_src": BASELINE_SRC}
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

    # single-call latency rows: the reference's single-op regime. Single-key
    # calls route through the native C++ host core (oo.py) — a device round
    # trip costs the ~3 ms tunnel floor regardless of batch, so the host
    # path owns this regime. value = 1/latency of one host-path call.
    from curve25519_tpu import oo
    from curve25519_tpu.native import bindings as nb
    priv1 = oo.X25519Private(bytes(np.asarray(sk[0])))
    peer1 = bytes(np.asarray(peer[0]))
    priv1.create_shared_key(peer1, kdf=False)        # warm (lib load)
    t1 = bench_host(lambda: priv1.create_shared_key(peer1, kdf=False))
    # device-path small-batch latencies, for the routing-cliff record
    td1 = bench_chain(f, (peer[:1], sk[:1]), reps)
    t1k = bench_chain(f, (peer[:1024], sk[:1024]), reps)
    emit("x25519_single_call_latency", 1.0 / t1,
         {"batch": 1, "path": "native-host", "latency_us": round(t1 * 1e6, 2),
          "device_batch1_ms": round(td1 * 1e3, 3),
          "device_batch1024_ms": round(t1k * 1e3, 3)})

    # the reference's remaining single-op records (folding paths,
    # README.md:70-71,86-97) — contested by the native folding-8 fast path
    # (bit-identical to the JAX path; pinned by tests/test_native_oracle.py).
    # Timed at the C-ABI boundary with preallocated buffers, matching what
    # the reference's speed_test times (the C call, test/curve25519_test.c:
    # 159-166) — the python-bytes convenience wrappers add ~2-3 us/call of
    # FFI buffer copies that are not part of the op.
    import ctypes
    sk0 = bytes(np.asarray(sk[0]))
    seed0 = bytes(np.asarray(seed[0]))
    msg0 = bytes(np.asarray(msg[0]))
    assert nb.x25519_base_fast(sk0) == orc.x25519_base(sk0)
    pk0, priv0 = nb.ed25519_keypair_fast(seed0)
    assert (pk0, priv0) == orc.ed_keypair(seed0)
    assert nb.ed25519_sign_fast(priv0, msg0) == orc.ed_sign(priv0, msg0)
    lib = nb.load()
    c_sk = (ctypes.c_uint8 * 32)(*seed0)
    c_pk = (ctypes.c_uint8 * 32)()
    c_priv = (ctypes.c_uint8 * 64)(*priv0)
    c_sig = (ctypes.c_uint8 * 64)()
    c_msg = (ctypes.c_uint8 * 64)(*msg0)
    c_out = (ctypes.c_uint8 * 32)()
    tpf = bench_host(lambda: lib.c25519_x25519_base_fast(c_out, c_sk),
                     n=20000)
    emit("x25519_public_key_fast_single", 1.0 / tpf,
         {"batch": 1, "path": "native-host-fold8",
          "latency_us": round(tpf * 1e6, 2), **ver})
    tkg = bench_host(
        lambda: lib.c25519_ed25519_keypair_fast(c_pk, c_priv, c_sk),
        n=20000)
    emit("ed25519_keygen_single", 1.0 / tkg,
         {"batch": 1, "path": "native-host-fold8",
          "latency_us": round(tkg * 1e6, 2), **ver})
    c_priv = (ctypes.c_uint8 * 64)(*priv0)      # keypair_fast overwrote it
    tsg = bench_host(
        lambda: lib.c25519_ed25519_sign_fast(c_sig, c_priv, c_msg, 64),
        n=20000)
    emit("ed25519_sign_single", 1.0 / tsg,
         {"batch": 1, "path": "native-host-fold8",
          "latency_us": round(tsg * 1e6, 2), **ver})

    # config 3: 8-fold base-point multiply (folding kernel)
    base_want = [orc.x25519_base(skb[i]) for i in range(NV)]
    f = jax.jit(x25519.calculate_public_key_fast)
    check_rows("x25519_public_key_fast", np.asarray(f(sk))[:NV], base_want)
    emit("x25519_public_key_fast", B / bench_chain(f, (sk,), reps),
         {"batch": B, **ver})
    # the plain-ladder CalculatePublicKey route (reference
    # curve25519_dh.c:192-198), also on the Pallas ladder kernel
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

    # config 4: Ed25519 batch verify, two-phase and one-shot. The ctx
    # always enters jit as TRACED ARGUMENTS — baking a 64K-lane q_table in
    # as a closure constant inflates the HLO past what the remote compiler
    # accepts (the r3 HTTP-413 failure mode) and hides the HBM cost.
    sig = ed25519.sign(priv, msg, mlen)
    f = jax.jit(ed25519.verify_init)
    emit("ed25519_verify_init", B / bench_chain(f, (pk,), reps),
         {"batch": B, **ver})   # verified transitively via verify_check below
    ctx = ed25519.verify_init(pk)
    fvc = jax.jit(lambda planes, ok, pkb, s, m, l: ed25519.verify_check(
        {"pk": pkb, "planes": planes, "ok": ok}, s, m, l))

    def vc_args(c, s, m, l):
        return (c["planes"], c["ok"], c["pk"], s, m, l)

    # gate: all valid lanes accept, a tampered lane rejects
    ok = np.asarray(fvc(*vc_args(ctx, sig, msg, mlen)))
    bad_sig = sig.at[0, 0].set(sig[0, 0] ^ 1)
    ok_bad = np.asarray(fvc(*vc_args(ctx, bad_sig, msg, mlen)))
    if not (ok.all() and not ok_bad[0] and ok_bad[1:].all()):
        raise AssertionError("verify_check gate failed: "
                             f"valid={ok.all()} tampered={ok_bad[0]}")
    emit("ed25519_verify_check",
         B / bench_chain(fvc, vc_args(ctx, sig, msg, mlen), reps),
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
    ok = np.asarray(fvc(*vc_args(ctx_sh, sig_sh, msg, mlen)))
    bad_sig = sig_sh.at[0, 0].set(sig_sh[0, 0] ^ 1)
    ok_bad = np.asarray(fvc(*vc_args(ctx_sh, bad_sig, msg, mlen)))
    if not (ok.all() and not ok_bad[0] and ok_bad[1:].all()):
        raise AssertionError("shared-pk verify gate failed")
    emit("ed25519_verify_check_shared",
         B / bench_chain(fvc, vc_args(ctx_sh, sig_sh, msg, mlen), reps),
         {"batch": B, "note": "1 pk x B msgs, shared MXU q_table", **ver})

    # multi-pk verify at full scale: Bm DISTINCT pubkeys, per-lane q_table
    # planes shipped as traced int8 args chunked through HBM (the r3 wall:
    # 256K lanes x 2.5 KB/lane = 640 MB of planes — fine as data, fatal as
    # an HLO constant). Closes VERDICT r3 item 4.
    Bm = (1 << 18) if not args.quick else B
    seeds_m = jnp.asarray(rng.integers(0, 256, (Bm, 32), dtype=np.uint8))
    msg_m = jnp.asarray(rng.integers(0, 256, (Bm, 64), dtype=np.uint8))
    mlen_m = jnp.full((Bm,), 64, jnp.int32)
    pk_m, priv_m = jax.jit(ed25519.create_keypair)(seeds_m)
    sig_m = jax.jit(ed25519.sign)(priv_m, msg_m, mlen_m)
    ctx_m = jax.jit(ed25519.verify_init)(pk_m)
    ok = np.asarray(fvc(*vc_args(ctx_m, sig_m, msg_m, mlen_m)))
    bad_m = sig_m.at[0, 0].set(sig_m[0, 0] ^ 1)
    ok_bad = np.asarray(fvc(*vc_args(ctx_m, bad_m, msg_m, mlen_m)))
    if not (ok.all() and not ok_bad[0] and ok_bad[1:].all()):
        raise AssertionError("multi-pk verify gate failed")
    # oracle spot-check on 2 lanes
    for i in range(2):
        assert orc.ed_verify(bytes(np.asarray(sig_m[i])),
                             bytes(np.asarray(pk_m[i])),
                             bytes(np.asarray(msg_m[i])))
    emit("ed25519_verify_check_multipk",
         Bm / bench_chain(fvc, vc_args(ctx_m, sig_m, msg_m, mlen_m),
                          max(2, reps // 2)),
         {"batch": Bm, "note": f"{Bm} distinct pks, per-lane q_table planes "
          "as traced args", **ver})
    del ctx_m, sig_m, msg_m, pk_m, priv_m, seeds_m

    # long-message SHA-512: the chunked kernel streams CHUNK_BLOCKS-block
    # chunks, so VMEM holds O(chunk) while messages are 1 MiB. One full
    # 1024-lane leg (sub-batching below a whole tile wastes 3/4 of the VPU
    # lanes — measured 2.3x slower); the ~2.5 GiB of peak HBM this
    # materializes (messages + packed words + mask intermediates) is noted
    # in the record for smaller-HBM chips (ADVICE r3). Data is generated
    # on-device; value is hashed bytes/s over actual lengths.
    import hashlib as _hl
    Bl, Ll = 1024, 1 << 20
    f = jax.jit(sha512)
    key = jax.random.PRNGKey(7)
    lmsg = jax.random.randint(key, (Bl, Ll), 0, 256, jnp.uint8)
    llen = jnp.concatenate([
        jnp.asarray([0, 1, 111, Ll - 1], jnp.int32),
        jax.random.randint(jax.random.PRNGKey(8), (Bl - 5,), 0, Ll + 1,
                           jnp.int32),
        jnp.asarray([Ll], jnp.int32)])
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
          "total_mib": round(total_bytes / 2**20, 1),
          "hbm_peak_note": "~2.5 GiB intermediates; needs a >=4 GiB-HBM "
          "chip or a smaller --batch", **ver})
    del lmsg, llen

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

    Bm2 = max(B // 8, 1024)
    f = jax.jit(mixed)
    sh_d, nok = f(sk[:Bm2], peer[:Bm2], msg[:Bm2])
    if int(nok) != Bm2:
        raise AssertionError(f"mixed gate failed: {int(nok)}/{Bm2} verified")
    check_rows("mixed_dh_sign_verify[shared]", np.asarray(sh_d)[:NV],
               [orc.x25519(skb[i], orc.x25519_base(peerb[i]))
                for i in range(NV)])
    secs = bench_chain(f, (sk[:Bm2], peer[:Bm2], msg[:Bm2]),
                       max(2, reps // 2))
    emit("mixed_dh_sign_verify", 6 * Bm2 / secs,
         {"batch": Bm2, "note": "6 protocol ops per lane", **ver})


if __name__ == "__main__":
    main()
