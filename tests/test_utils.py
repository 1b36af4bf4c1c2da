"""Tests for the auxiliary subsystems: profiling, debug dumpers, and
checkpoint/serialization of precomputed contexts (SURVEY.md §5)."""

import numpy as np
import jax.numpy as jnp

from curve25519_tpu.models import ed25519
from curve25519_tpu.utils import checkpoint, debug, profiling

rng = np.random.default_rng(5)


def test_hex_dumpers():
    b = bytes(range(4))
    assert debug.hex_bytes(b) == "0x03020100"
    assert debug.hex_bytes(b, "k") == "k = 0x03020100"
    assert debug.hex_words(np.array([1, 0x10], np.uint32)) == \
        "0x0000001000000001"
    assert debug.hex_fe(np.array([5, 1], np.int32)) == hex(5 + (1 << 13))
    # batched: one line per lane
    two = debug.hex_bytes(np.zeros((2, 4), np.uint8), "v")
    assert two.splitlines()[1].startswith("v[1] = ")


def test_checkpoint_roundtrip(tmp_path):
    tree = {"a": jnp.arange(6).reshape(2, 3),
            "nested": {"b": jnp.ones((4,), jnp.uint8)},
            "lst": [jnp.zeros((2,)), jnp.full((1,), 7)],
            "_secret": 123}
    p = tmp_path / "ctx.npz"
    checkpoint.save_pytree(p, tree)
    back = checkpoint.load_pytree(p)
    assert "_secret" not in back
    np.testing.assert_array_equal(np.asarray(back["a"]), np.arange(6).reshape(2, 3))
    np.testing.assert_array_equal(np.asarray(back["lst"][1]), [7])


def test_verify_ctx_serialization(tmp_path):
    """The EDP_SIGV_CTX analogue survives a save/load and still verifies
    (reference caches pk + q_table, ed25519_verify.c:44-47)."""
    seed = jnp.asarray(np.frombuffer(rng.bytes(32), np.uint8))
    msg = jnp.asarray(np.frombuffer(b"persisted-context", np.uint8))
    pk, priv = ed25519.create_keypair(seed)
    sig = ed25519.sign(priv, msg)

    ctx = ed25519.verify_init(pk)
    p = tmp_path / "sigv.npz"
    checkpoint.save_verify_ctx(p, ctx)
    ctx2 = checkpoint.load_verify_ctx(p)
    assert bool(np.asarray(ed25519.verify_check(ctx2, sig, msg)))
    bad = sig.at[3].set(sig[3] ^ 1)
    assert not bool(np.asarray(ed25519.verify_check(ctx2, bad, msg)))


def test_bench_timer_runs():
    f = lambda x: x + 1
    dt = profiling.bench(f, jnp.zeros((8,)), reps=2, rounds=1)
    assert dt > 0

    c = profiling.Counter("test_ops")
    with profiling.timed(c, ops=100):
        pass
    assert c.ops == 100 and "test_ops" in c.json(1.0)
