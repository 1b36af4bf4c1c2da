"""Multi-device / multi-host scaling: batch sharding over a device mesh.

The reference is strictly single-threaded scalar code (reference README.md:19-21
— "without ... parallel processing"); the entire distribution story of this
framework is TPU-native by design (SURVEY.md §2 "Parallelism & distributed
communication"):

- **Data parallelism** is the natural axis: every DH/sign/verify op is
  independent, so batches shard over a 1-D ``Mesh(("dp",))`` spanning all
  chips (and hosts, when launched multi-controller).
- Folding tables (~120 KB int8) and blinding contexts replicate onto every
  device — they are compile-time constants in the jitted graphs.
- The only cross-device traffic is metric reduction: throughput counters and
  verify-verdict counts ride a `psum` over ICI (DCN between hosts), wired
  through `shard_map`.
"""

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["make_mesh", "make_pod_mesh", "shard_batch", "replicate",
           "sharded", "mixed_throughput_step", "init_distributed"]


def make_mesh(devices=None, axis_name="dp"):
    """1-D data-parallel mesh over the given (default: all) devices."""
    if devices is None:
        devices = jax.devices()
    import numpy as np
    return Mesh(np.asarray(devices), (axis_name,))


def make_pod_mesh(axis_name="dp"):
    """1-D mesh over every chip of every host, ordered host-major so that a
    contiguous batch shard maps onto one host's ICI domain and the only
    inter-host (DCN) traffic is the scalar psum of metrics. Call
    init_distributed first on multi-controller launches."""
    return make_mesh(sorted(jax.devices(),
                            key=lambda d: (d.process_index, d.id)),
                     axis_name)


def sharded(fn, mesh, axis_name="dp"):
    """jit a batched model function with every array argument and result
    sharded on its leading (batch) axis — pure data parallelism.

    Works for any of the models.* batched functions: per-shard semantics are
    identical to the global call because every protocol op is lane-local
    (there is no cross-lane math anywhere in the compute path), and each
    shard independently routes to the Pallas kernels when its *local* batch
    is >= 1024 lanes."""
    inner = jax.shard_map(
        fn, mesh=mesh, in_specs=P(axis_name), out_specs=P(axis_name),
        check_vma=False)  # pallas_call out_shapes carry no vma annotation
    return jax.jit(inner)


def shard_batch(x, mesh, axis_name="dp"):
    """Place a batched array with its leading axis sharded over the mesh."""
    return jax.device_put(x, NamedSharding(mesh, P(axis_name)))


def replicate(x, mesh):
    return jax.device_put(x, NamedSharding(mesh, P()))


def mixed_throughput_step(mesh, axis_name="dp"):
    """Build the jitted full pipeline step, sharded over the mesh.

    One step runs, per shard: X25519 keygen + shared-key, Ed25519 keygen +
    sign + verify — the BASELINE.json config-5 "mixed DH+sign+verify batch" —
    and reduces (ok_count, op_count) across devices with psum.

    Returns fn(sk_a, sk_b, msgs) -> (ok_count, op_count, shared_a) where the
    counters are global (replicated) scalars.
    """
    from curve25519_tpu.models import ed25519, x25519

    def per_shard(sk_a, sk_b, msgs):
        a_pk = x25519.calculate_public_key(sk_a)
        b_pk = x25519.calculate_public_key(sk_b)
        s_ab = x25519.create_shared_key(b_pk, sk_a)
        s_ba = x25519.create_shared_key(a_pk, sk_b)
        dh_ok = jnp.all(s_ab == s_ba, axis=-1)

        pk, priv = ed25519.create_keypair(sk_a)
        sigs = ed25519.sign(priv, msgs)
        sig_ok = ed25519.verify(sigs, pk, msgs)

        ok = jnp.sum(dh_ok.astype(jnp.int32)) + jnp.sum(sig_ok.astype(jnp.int32))
        ops = jnp.int32(sk_a.shape[0] * 2)  # one DH + one sign/verify per lane
        ok = jax.lax.psum(ok, axis_name)
        ops = jax.lax.psum(ops, axis_name)
        return ok, ops, s_ab

    sharded = jax.shard_map(
        per_shard, mesh=mesh,
        in_specs=(P(axis_name), P(axis_name), P(axis_name)),
        out_specs=(P(), P(), P(axis_name)),
        check_vma=False)  # pallas_call out_shapes carry no vma annotation
    return jax.jit(sharded)


def init_distributed(coordinator=None, num_processes=None, process_id=None):
    """Multi-controller bring-up for pod-scale runs (no-op when single
    process). Thin wrapper over jax.distributed.initialize so launchers can
    `python -c "from curve25519_tpu.parallel.mesh import init_distributed; ..."`."""
    if num_processes is None or num_processes <= 1:
        return
    jax.distributed.initialize(coordinator_address=coordinator,
                               num_processes=num_processes,
                               process_id=process_id)
