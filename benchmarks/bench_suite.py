"""Full benchmark suite — one JSON line per BASELINE.json config.

Mirrors the reference speed_test discipline (test/curve25519_test.c:130-321):
compile/warm first, then best-of-rounds over a serially-dependent dispatch
chain closed by a host fetch (the axon tunnel's block_until_ready returns
early, so timing must force a data dependency or a device->host copy).

Usage:  python benchmarks/bench_suite.py [--batch 65536] [--quick]

Baselines are the reference's single-core numbers normalized to ops/s
(BASELINE.md); `vs_baseline` is per-chip speedup over one x86 core.
"""

import argparse
import json
import os
import sys
import time

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
}


def bench_chain(fn, args, reps=6, rounds=3):
    """Best-of-rounds seconds/call; each round issues `reps` dependent-free
    dispatches and closes with a host fetch."""
    import jax
    r = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(r)[0])          # compile + sync
    best = float("inf")
    for _ in range(rounds):
        t0 = time.perf_counter()
        for _ in range(reps):
            r = fn(*args)
        np.asarray(jax.tree_util.tree_leaves(r)[0])
        best = min(best, (time.perf_counter() - t0) / reps)
    return best


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

    # config 1: X25519 DH shared secret (ladder kernel)
    f = jax.jit(x25519.create_shared_key)
    emit("x25519_shared_secret", B / bench_chain(f, (peer, sk), reps),
         {"batch": B})

    # single-call / small-batch latency: 1, 64 and 1024 lanes all run the
    # same one-tile padded kernel (the reference's single-op regime,
    # README.md:86 — there 43K cycles; here one kernel launch + tunnel
    # dispatch). value = 1/latency of the single call.
    t1 = bench_chain(f, (peer[:1], sk[:1]), reps)
    t64 = bench_chain(f, (peer[:64], sk[:64]), reps)
    t1k = bench_chain(f, (peer[:1024], sk[:1024]), reps)
    emit("x25519_single_call_latency", 1.0 / t1,
         {"batch": 1, "latency_ms": round(t1 * 1e3, 3),
          "batch64_ms": round(t64 * 1e3, 3),
          "batch1024_ms": round(t1k * 1e3, 3)})

    # config 3: 8-fold base-point multiply (folding kernel)
    f = jax.jit(x25519.calculate_public_key_fast)
    emit("x25519_public_key_fast", B / bench_chain(f, (sk,), reps),
         {"batch": B})
    # 4-fold variant: 16-entry table, 62 doubles + 63 adds (the reference's
    # memory/speed tradeoff pair, curve25519_utils.c:125-153)
    f4 = jax.jit(lambda s: x25519.calculate_public_key_fast(s, nfolds=4))
    emit("x25519_public_key_fold4", B / bench_chain(f4, (sk,), reps),
         {"batch": B})

    # config 2: Ed25519 keygen + sign (+ SHA-512 kernel)
    f = jax.jit(ed25519.create_keypair)
    emit("ed25519_keygen", B / bench_chain(f, (seed,), reps), {"batch": B})
    pk, priv = ed25519.create_keypair(seed)
    f = jax.jit(ed25519.sign)
    emit("ed25519_sign", B / bench_chain(f, (priv, msg, mlen), reps),
         {"batch": B})
    bctx = blinding.as_batch(blinding.blinding_init(b"bench-blinder"), (B,))
    fb = jax.jit(lambda p, m, l: ed25519.sign(p, m, l, blinding=bctx))
    emit("ed25519_sign_blinded",
         B / bench_chain(fb, (priv, msg, mlen), reps), {"batch": B})
    f = jax.jit(sha512)
    emit("sha512_64b", B / bench_chain(f, (msg, mlen), reps), {"batch": B})

    # config 4: Ed25519 batch verify, two-phase and one-shot
    sig = ed25519.sign(priv, msg, mlen)
    f = jax.jit(ed25519.verify_init)
    emit("ed25519_verify_init", B / bench_chain(f, (pk,), reps),
         {"batch": B})
    ctx = ed25519.verify_init(pk)
    f = jax.jit(lambda s, m, l: ed25519.verify_check(ctx, s, m, l))
    emit("ed25519_verify_check", B / bench_chain(f, (sig, msg, mlen), reps),
         {"batch": B})
    f = jax.jit(ed25519.verify)
    emit("ed25519_verify_oneshot",
         B / bench_chain(f, (sig, pk, msg, mlen), reps), {"batch": B})

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
    secs = bench_chain(f, (sk[:Bm], peer[:Bm], msg[:Bm]), max(2, reps // 2))
    emit("mixed_dh_sign_verify", 6 * Bm / secs,
         {"batch": Bm, "note": "6 protocol ops per lane"})


if __name__ == "__main__":
    main()
