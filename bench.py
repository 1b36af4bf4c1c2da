"""Benchmark harness — prints ONE JSON line with the headline metric.

Metric: X25519 shared-secret ops/s/chip (batched Montgomery ladder on the
real TPU). Baseline: the reference's CreateSharedKey at ~12,549 ops/s on a
single x86 core (270,930 cycles @3.4GHz, BASELINE.md / reference
README.md:123-125).

Discipline mirrors the reference speed_test (test/curve25519_test.c:130-321):
warm up (compile), then best-of-N timed repetitions.
"""

import json
import time

import numpy as np

BASELINE_OPS_PER_S = 12_549.0   # reference CreateSharedKey, single core


def main():
    import jax
    import jax.numpy as jnp
    from curve25519_tpu.models import x25519

    rng = np.random.default_rng(0)
    B = 262144   # ~124 ms/call: amortizes the ~3 ms tunnel dispatch floor
    sk = jnp.asarray(rng.integers(0, 256, (B, 32), dtype=np.uint8))
    peer = jnp.asarray(rng.integers(0, 256, (B, 32), dtype=np.uint8))

    # Correctness gate before timing (the reference refuses to bench until
    # donna matches, test/curve25519_test.c:143-154): one kernel tile of
    # device output vs the host oracle.
    import sys, os
    sys.path.insert(0, os.path.join(os.path.dirname(
        os.path.abspath(__file__)), "benchmarks"))
    from correctness_gate import Oracle, check_rows
    orc = Oracle()
    raw = jax.jit(x25519.create_shared_key)
    got = np.asarray(raw(peer[:1024], sk[:1024]))[:4]
    check_rows("x25519_shared_secret", got,
               [orc.x25519(bytes(np.asarray(sk[i])),
                           bytes(np.asarray(peer[i]))) for i in range(4)])
    verified = True

    # Scalar-reduced output: the timed quantity is device compute, not the
    # 8 MB result fetch through the tunnel.
    fn = jax.jit(lambda p, s: x25519.create_shared_key(p, s)
                 .astype(jnp.int32).sum())
    np.asarray(fn(peer, sk))         # compile + warm + hard sync
    # The axon tunnel's block_until_ready doesn't actually block, so each
    # round issues N dispatches and closes with a host fetch of the LAST
    # result: execution on the single device stream is FIFO, so the fetch
    # bounds all N calls. (A serial output->input chain would also work but
    # adds ~15 ms of tunnel round-trip latency per link — measured — which
    # is tunnel overhead, not device throughput.)
    N = 4
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(N):
            r = fn(peer, sk)
        np.asarray(r)
        best = min(best, (time.perf_counter() - t0) / N)

    ops_per_s = B / best
    print(json.dumps({
        "metric": "x25519_shared_secret_ops_per_s_per_chip",
        "value": round(ops_per_s, 1),
        "unit": "ops/s",
        "vs_baseline": round(ops_per_s / BASELINE_OPS_PER_S, 3),
        "verified": verified,
        "oracle": orc.label,
    }))


if __name__ == "__main__":
    main()
