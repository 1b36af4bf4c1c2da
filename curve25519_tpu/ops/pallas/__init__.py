"""Pallas TPU kernels for the hot paths (full-ladder X25519, folding-8
Edwards base mult). Import the submodules lazily — they pull in
jax.experimental.pallas."""

import jax

__all__ = ["use_pallas", "flatten_batch"]


def use_pallas(batch_shape):
    """Route ALL TPU executions through the Pallas kernels; CPU (tests)
    uses the portable jnp path. Decided at trace time (the backend is
    static). Batch shape no longer gates routing: the kernel wrappers
    flatten arbitrary leading batch axes and pad to a whole 1024-lane tile,
    so a single-key call costs one tile — the same launch latency as a
    full 1024 batch — instead of silently falling to the lane-wasting jnp
    path (the TPU analogue of the reference's single-call latency path,
    source/curve25519_dh.c:94-157).

    A pinned non-TPU jax_default_device wins over the backend priority:
    the axon TPU plugin keeps default_backend() == "tpu" even when tests /
    the multichip dryrun pin execution to CPU devices, where the Mosaic
    kernels cannot run."""
    del batch_shape
    dev = jax.config.jax_default_device
    if dev is not None:
        return getattr(dev, "platform", "tpu") == "tpu"
    return jax.default_backend() == "tpu"


def flatten_batch(batch_shape):
    """Helpers for kernel wrappers that take arbitrary leading batch axes.

    Returns (flat_n, unflatten) where flat_n = prod(batch_shape) (1 for a
    scalar call) and unflatten(x) restores the leading axes on a [flat_n,
    ...] result."""
    import math
    batch_shape = tuple(batch_shape)
    flat_n = math.prod(batch_shape) if batch_shape else 1

    def unflatten(x):
        return x.reshape(batch_shape + x.shape[1:])

    return flat_n, unflatten
