"""Kernel-timeline capture: jax.profiler traces of every hot Pallas kernel.

The scriptable counterpart of the reference's per-op cycle windows
(reference: speed_test, test/curve25519_test.c:130-321) at kernel
granularity: each headline op is dispatched a few times inside a
jax.profiler trace and the device events are aggregated with
utils.profiling.trace_summary — real measured kernel time, complementing
the chain-slope microbenchmarks in bench_fe_micro.py (which remain useful
for sub-kernel op attribution the timeline cannot see).

Usage:  python benchmarks/trace_kernels.py [--batch 65536] [--reps 3]
Emits one JSON line per kernel: device us/call and implied ops/s/chip.
"""

import argparse
import json
import os
import shutil
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# pallas_call kernel names as they appear in the trace (jit wrapper name)
KERNELS = {
    "x25519_shared_secret": "ladder_tiled",
    "x25519_public_key_fast": "base_mult_tiled",
    "ed25519_verify_check": "poly_mult_tiled",
    "ed25519_verify_init": "verify_init_tiled",
    "sha512_64b": "sha512_blocks_tiled",
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=65536)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--logdir", default="/tmp/curve25519_tpu_trace")
    args = ap.parse_args()
    B, reps = args.batch, args.reps

    import jax
    import jax.numpy as jnp
    from curve25519_tpu.models import ed25519, x25519
    from curve25519_tpu.ops.sha512 import sha512
    from curve25519_tpu.utils import profiling

    rng = np.random.default_rng(0)
    sk = jnp.asarray(rng.integers(0, 256, (B, 32), dtype=np.uint8))
    peer = jnp.asarray(rng.integers(0, 256, (B, 32), dtype=np.uint8))
    msg = jnp.asarray(rng.integers(0, 256, (B, 64), dtype=np.uint8))
    mlen = jnp.full((B,), 64, jnp.int32)

    pk, priv = ed25519.create_keypair(sk)
    sig = ed25519.sign(priv, msg, mlen)
    ctx = ed25519.verify_init(pk)

    # ctx as traced args (a closure-constant q_table bloats the HLO)
    fvc = jax.jit(lambda planes, ok, pkb, s, m, l: ed25519.verify_check(
        {"pk": pkb, "planes": planes, "ok": ok}, s, m, l))

    ops = {
        "x25519_shared_secret": (jax.jit(x25519.create_shared_key),
                                 (peer, sk)),
        "x25519_public_key_fast": (jax.jit(x25519.calculate_public_key_fast),
                                   (sk,)),
        "ed25519_verify_check": (
            fvc, (ctx["planes"], ctx["ok"], ctx["pk"], sig, msg, mlen)),
        "ed25519_verify_init": (jax.jit(ed25519.verify_init), (pk,)),
        "sha512_64b": (jax.jit(sha512), (msg, mlen)),
    }

    for name, (fn, a) in ops.items():
        np.asarray(profiling.jax_leaf(fn(*a)))          # compile + sync
        logdir = f"{args.logdir}/{name}"
        shutil.rmtree(logdir, ignore_errors=True)
        with profiling.trace(logdir):
            for _ in range(reps):
                r = fn(*a)
            np.asarray(profiling.jax_leaf(r))           # bound all reps
        summary = profiling.trace_summary(logdir, prefix=KERNELS[name])
        if not summary:
            print(json.dumps({"metric": f"trace:{name}",
                              "error": "kernel not found in trace"}))
            continue
        kname, d = next(iter(summary.items()))
        us_per_call = d["total_us"] / d["count"]
        calls_per_dispatch = d["count"] / reps          # grid tiles count as 1
        print(json.dumps({
            "metric": f"trace:{name}", "kernel": kname,
            "device_us_per_dispatch": round(us_per_call * calls_per_dispatch,
                                            1),
            "batch": B,
            "kernel_ops_per_s": round(
                B / (us_per_call * calls_per_dispatch * 1e-6), 1),
        }), flush=True)

    # ---- end-to-end glue attribution (VERDICT r3 item 1's "done" gate):
    # for each whole protocol op, total DEVICE time per dispatch vs the
    # Pallas-kernel share of it; the difference is inter-kernel glue
    # (codecs, relayouts, fusions) running on-device between kernels.
    KNOWN = ("ladder_tiled", "base_mult_tiled", "poly_mult_tiled",
             "verify_init_tiled", "sha512_blocks_tiled",
             "keygen_tiled", "sign_tiled", "verify_oneshot_tiled")
    e2e = {
        "ed25519_keygen": (jax.jit(ed25519.create_keypair), (sk,)),
        "ed25519_sign": (jax.jit(ed25519.sign), (priv, msg, mlen)),
        "ed25519_verify_oneshot": (jax.jit(ed25519.verify),
                                   (sig, pk, msg, mlen)),
        "x25519_shared_secret_e2e": (jax.jit(x25519.create_shared_key),
                                     (peer, sk)),
    }
    for name, (fn, a) in e2e.items():
        np.asarray(profiling.jax_leaf(fn(*a)))
        logdir = f"{args.logdir}/e2e_{name}"
        shutil.rmtree(logdir, ignore_errors=True)
        with profiling.trace(logdir):
            for _ in range(reps):
                r = fn(*a)
            np.asarray(profiling.jax_leaf(r))
        dev = profiling.trace_device_events(logdir)
        # the jit_<fn> module span is the WHOLE device execution (op events
        # nest inside it — summing everything would double count)
        total = sum(d["total_us"] for k, d in dev.items()
                    if k.startswith("jit_"))
        kern = sum(d["total_us"] for k, d in dev.items()
                   if k.startswith(KNOWN))
        print(json.dumps({
            "metric": f"trace_e2e:{name}", "batch": B,
            "device_ms_per_dispatch": round(total / reps / 1e3, 3),
            "kernel_ms_per_dispatch": round(kern / reps / 1e3, 3),
            "glue_ms_per_dispatch": round((total - kern) / reps / 1e3, 3),
            "glue_share": round((total - kern) / total, 4) if total else None,
            "device_ops_per_s": round(B / (total / reps * 1e-6), 1)
            if total else None,
        }), flush=True)


if __name__ == "__main__":
    main()
