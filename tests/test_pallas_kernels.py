"""Pallas kernel correctness in interpreter mode (CPU) vs the scan path and
the python oracle. On real TPU hardware the same kernels are exercised by
bench.py and the verify-skill drives."""

import numpy as np
import jax.numpy as jnp
import pytest

from curve25519_tpu import refmodel
from curve25519_tpu.ops.pallas import ladder_kernel as lk

rng = np.random.default_rng(31)


@pytest.mark.slow
def test_pallas_ladder_interpret_matches_oracle():
    B = lk.ft.TILE_BATCH  # one tile
    sk = rng.integers(0, 256, (B, 32), dtype=np.uint8)
    peer = rng.integers(0, 256, (B, 32), dtype=np.uint8)
    out = np.asarray(lk.point_multiply_pallas(
        jnp.asarray(peer), jnp.asarray(sk), interpret=True))
    for i in range(3):
        assert bytes(out[i].tolist()) == refmodel.x25519(
            sk[i].tobytes(), peer[i].tobytes())


def test_tile_untile_roundtrip():
    x = jnp.asarray(rng.integers(0, 8192, (2 * lk.ft.TILE_BATCH, 20),
                                 dtype=np.int32))
    assert np.array_equal(np.asarray(lk._untile(lk._tile(x, 2))),
                          np.asarray(x))
