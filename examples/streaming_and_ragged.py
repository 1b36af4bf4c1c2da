"""Variable-length inputs without dynamic shapes: the streaming SHA-512
facade, ragged sign/verify batches bucketed by block count, and a
serialized (checkpointed) two-phase verify context.

Run from the repo root:  python examples/streaming_and_ragged.py
"""

import hashlib
import os
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax.numpy as jnp
    from curve25519_tpu.models import ed25519
    from curve25519_tpu.ops.sha512 import Sha512
    from curve25519_tpu.utils import checkpoint

    # --- streaming SHA-512: O(1) memory, any length -----------------------
    # The facade keeps only (8-word state, <128-byte tail, exact length) —
    # equivalent of the reference's SHA512_Init/Update/Final, so a stream
    # never needs to exist in memory at once.
    h = Sha512()
    ref = hashlib.sha512()
    rng = np.random.default_rng(0)
    for _ in range(64):
        chunk = rng.integers(0, 256, 1 << 16, dtype=np.uint8).tobytes()
        h.update(chunk)
        ref.update(chunk)
    digest = h.final()
    assert digest == ref.digest()
    print(f"streamed 4 MiB in 64 KiB chunks: sha512 = {digest[:8].hex()}… (matches hashlib)")

    # --- ragged Ed25519 batch: one compile per distinct block count -------
    # Messages of mixed lengths are grouped into same-block-count buckets;
    # no lane pays another lane's padding, and results come back in input
    # order.
    n = 512
    msgs = [rng.integers(0, 256, int(L), dtype=np.uint8).tobytes()
            for L in rng.integers(0, 4096, n)]
    seed = jnp.asarray(rng.integers(0, 256, (32,), dtype=np.uint8))
    pk, priv = ed25519.create_keypair(seed[None, :])
    pk, priv = pk[0], priv[0]

    sigs = ed25519.sign_ragged(priv[None, :], msgs)
    ok = ed25519.verify_ragged(sigs, pk, msgs)
    print(f"ragged batch: {int(np.asarray(ok).sum())}/{n} mixed-length "
          f"signatures verified (lengths 0..4095)")

    # --- two-phase verify with a checkpointed context ---------------------
    # verify_init's q_table is a cacheable precompute (the reference's
    # EDP_SIGV_CTX); serialize it once per pubkey and reuse across batches
    # and processes — verify_ragged then runs ZERO inits.
    ctx = ed25519.verify_init(pk)
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "verify_ctx.npz")
        checkpoint.save_verify_ctx(path, ctx)
        ctx2 = checkpoint.load_verify_ctx(path)
    ok2 = ed25519.verify_ragged(sigs, pk, msgs, ctx=ctx2)
    assert bool(np.asarray(ok2).all())
    print("reloaded verify ctx from disk; ragged verify ran with zero inits")


if __name__ == "__main__":
    main()
