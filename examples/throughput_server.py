"""Sustained-throughput serving loop: keep the chip busy with overlapped
dispatch (JAX dispatch is asynchronous — enqueue the next batch while the
previous one computes), shard over every available device, and report
psum-style aggregate counters.

Run from the repo root:  python examples/throughput_server.py [seconds]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(duration_s=10.0):
    import jax
    import jax.numpy as jnp
    from curve25519_tpu.models import ed25519
    from curve25519_tpu.parallel import mesh as pmesh
    from curve25519_tpu.utils.profiling import Counter

    m = pmesh.make_pod_mesh()
    n_dev = m.devices.size
    B = 16384 * n_dev
    print(f"mesh: {n_dev} device(s), batch {B}")

    rng = np.random.default_rng(0)
    seed = pmesh.shard_batch(
        jnp.asarray(rng.integers(0, 256, (B, 32), dtype=np.uint8)), m)
    msg = pmesh.shard_batch(
        jnp.asarray(rng.integers(0, 256, (B, 64), dtype=np.uint8)), m)

    keypair = pmesh.sharded(ed25519.create_keypair, m)
    sign = pmesh.sharded(lambda p, ms: ed25519.sign(p, ms), m)

    pk, priv = keypair(seed)                # warm + build contexts
    jax.block_until_ready(sign(priv, msg))  # compile

    # steady state: keep >=2 batches in flight; sync on the oldest result
    c = Counter("ed25519_sign")
    t_end = time.time() + duration_s
    inflight = []
    t0 = time.perf_counter()
    while time.time() < t_end:
        inflight.append(sign(priv, msg))
        if len(inflight) >= 2:
            np.asarray(inflight.pop(0)[0, 0])  # host fetch = sync barrier
            c.add(B, 0.0)
    for r in inflight:
        np.asarray(r[0, 0])
        c.add(B, 0.0)
    c.seconds = time.perf_counter() - t0
    print(c.json())


if __name__ == "__main__":
    main(float(sys.argv[1]) if len(sys.argv) > 1 else 10.0)
