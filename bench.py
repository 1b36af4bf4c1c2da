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
    B = 65536
    sk = jnp.asarray(rng.integers(0, 256, (B, 32), dtype=np.uint8))
    peer = jnp.asarray(rng.integers(0, 256, (B, 32), dtype=np.uint8))

    fn = jax.jit(x25519.create_shared_key)   # auto-routes to the Pallas kernel
    np.asarray(fn(peer, sk))         # compile + warm + hard sync
    # The axon tunnel's block_until_ready doesn't actually block, so timing
    # uses a serial dependency chain (each call consumes the previous result)
    # closed by a host fetch, which cannot complete early.
    N = 8
    best = float("inf")
    for _ in range(3):
        r = peer
        t0 = time.perf_counter()
        for _ in range(N):
            r = fn(r, sk)
        np.asarray(r)
        best = min(best, (time.perf_counter() - t0) / N)

    ops_per_s = B / best
    print(json.dumps({
        "metric": "x25519_shared_secret_ops_per_s_per_chip",
        "value": round(ops_per_s, 1),
        "unit": "ops/s",
        "vs_baseline": round(ops_per_s / BASELINE_OPS_PER_S, 3),
    }))


if __name__ == "__main__":
    main()
