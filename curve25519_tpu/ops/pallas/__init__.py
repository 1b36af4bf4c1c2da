"""Pallas TPU kernels for the hot paths (full-ladder X25519, folding-8
Edwards base mult). Import the submodules lazily — they pull in
jax.experimental.pallas."""

import jax


def use_pallas(batch_shape):
    """Route large flat TPU batches through the Pallas kernels; everything
    else (CPU tests, small/structured batches) uses the portable jnp path.
    Decided at trace time (shapes and backend are static)."""
    return (jax.default_backend() == "tpu" and len(batch_shape) == 1
            and batch_shape[0] >= 1024)
