"""Multi-device batch sharding on the virtual 8-CPU mesh: results must be
identical to single-device, and the psum'd counters must be global."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from curve25519_tpu.parallel import mesh as pmesh
from curve25519_tpu.models import x25519

rng = np.random.default_rng(17)


@pytest.fixture(scope="module")
def cpu_mesh():
    devs = jax.devices("cpu")
    if len(devs) < 8:
        pytest.skip("need 8 virtual cpu devices")
    return pmesh.make_mesh(devs[:8])


def test_sharded_matches_single_device(cpu_mesh):
    B = 16
    sk = jnp.asarray(rng.integers(0, 256, (B, 32), dtype=np.uint8))
    pk_single = x25519.calculate_public_key(sk)
    sk_sharded = pmesh.shard_batch(sk, cpu_mesh)
    pk_sharded = jax.jit(x25519.calculate_public_key)(sk_sharded)
    assert np.array_equal(np.asarray(pk_single), np.asarray(pk_sharded))


@pytest.mark.slow
def test_mixed_pipeline_psum_counters(cpu_mesh):
    B, L = 16, 8
    sk_a = pmesh.shard_batch(
        jnp.asarray(rng.integers(0, 256, (B, 32), dtype=np.uint8)), cpu_mesh)
    sk_b = pmesh.shard_batch(
        jnp.asarray(rng.integers(0, 256, (B, 32), dtype=np.uint8)), cpu_mesh)
    msgs = pmesh.shard_batch(
        jnp.asarray(rng.integers(0, 256, (B, L), dtype=np.uint8)), cpu_mesh)
    step = pmesh.mixed_throughput_step(cpu_mesh)
    ok, ops, shared = step(sk_a, sk_b, msgs)
    assert int(ops) == 2 * B
    assert int(ok) == 2 * B
    # shared output stays sharded over the mesh
    assert shared.sharding.spec == jax.sharding.PartitionSpec("dp")


@pytest.mark.slow
def test_sharded_wrapper_matches_single_device(cpu_mesh):
    """pmesh.sharded: per-shard execution of sign must equal the global
    batched call (lane-local semantics)."""
    from curve25519_tpu.models import ed25519
    B, L = 16, 24
    seed = jnp.asarray(rng.integers(0, 256, (B, 32), dtype=np.uint8))
    msg = jnp.asarray(rng.integers(0, 256, (B, L), dtype=np.uint8))
    mlen = jnp.full((B,), L, jnp.int32)
    pk, priv = ed25519.create_keypair(seed)
    sig_single = ed25519.sign(priv, msg, mlen)

    f = pmesh.sharded(ed25519.sign, cpu_mesh)
    sig_sharded = f(pmesh.shard_batch(priv, cpu_mesh),
                    pmesh.shard_batch(msg, cpu_mesh),
                    pmesh.shard_batch(mlen, cpu_mesh))
    assert np.array_equal(np.asarray(sig_single), np.asarray(sig_sharded))
    assert sig_sharded.sharding.spec == jax.sharding.PartitionSpec("dp")


def test_pod_mesh_single_process():
    m = pmesh.make_pod_mesh()
    assert m.devices.size == len(jax.devices())
