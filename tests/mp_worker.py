"""Multi-controller worker: one process of an N-process CPU 'pod'.

Launched by tests/test_multiprocess.py as
    python tests/mp_worker.py <process_id> <num_processes> <port> <devs_per_proc>

Exercises the real multi-controller bring-up path the reference never had
(SURVEY.md §2 'Distributed communication backend'): jax.distributed
initialization through curve25519_tpu.parallel.mesh.init_distributed, the
host-major pod mesh, globally-sharded batches, and the psum-reduced mixed
DH+sign+verify pipeline. Prints 'MP_OK ok=N ops=N' on success."""

import os
import sys


def main():
    pid, nproc, port, dpp = (int(sys.argv[1]), int(sys.argv[2]),
                             sys.argv[3], int(sys.argv[4]))
    os.environ["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={dpp}")
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ.setdefault("JAX_CPU_COLLECTIVES_IMPLEMENTATION", "gloo")
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))

    import jax
    from curve25519_tpu.parallel import mesh as pmesh

    pmesh.init_distributed(coordinator=f"127.0.0.1:{port}",
                           num_processes=nproc, process_id=pid)
    assert jax.process_count() == nproc, jax.process_count()
    devices = jax.devices()
    assert len(devices) == nproc * dpp, devices

    m = pmesh.make_pod_mesh()
    mesh_devs = list(m.devices.ravel())
    # host-major ordering: each host's chips are contiguous
    procs = [d.process_index for d in mesh_devs]
    assert procs == sorted(procs), procs

    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    B, L = 4 * nproc * dpp, 16
    rng = np.random.default_rng(9)
    sk_a = rng.integers(0, 256, (B, 32), dtype=np.uint8)
    sk_b = rng.integers(0, 256, (B, 32), dtype=np.uint8)
    msgs = rng.integers(0, 256, (B, L), dtype=np.uint8)

    sh = NamedSharding(m, P("dp"))

    def put(x):
        return jax.make_array_from_callback(x.shape, sh,
                                            lambda idx: x[idx])

    step = pmesh.mixed_throughput_step(m)
    ok, ops, shared = step(put(sk_a), put(sk_b), put(msgs))
    ok, ops = int(ok), int(ops)
    assert ops == 2 * B, (ok, ops)
    assert ok == 2 * B, f"pipeline verification failed: {ok}/{ops}"
    print(f"MP_OK ok={ok} ops={ops} procs={nproc} devs={len(devices)}",
          flush=True)


if __name__ == "__main__":
    main()
