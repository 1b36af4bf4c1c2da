"""Minimal end-to-end walkthrough: X25519 key exchange + Ed25519 signing,
single keys via the OO wrapper and batched via the functional API.

Run from the repo root:  python examples/dh_exchange.py
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax.numpy as jnp
    from curve25519_tpu.oo import ED25519Private, ED25519Public, X25519Private
    from curve25519_tpu.models import ed25519, x25519

    # --- single keys, host bytes (reference C++-wrapper style) ------------
    alice, bruce = X25519Private(), X25519Private()
    k_ab = alice.create_shared_key(bruce.get_public_key())
    k_ba = bruce.create_shared_key(alice.get_public_key())
    assert k_ab == k_ba
    print(f"DH shared secret (KDF'd): {k_ab.hex()}")

    signer = ED25519Private()
    sig = signer.sign(b"attack at dawn")
    ok = ED25519Public(signer.get_public_key()).verify(sig, b"attack at dawn")
    print(f"signature valid: {ok}")

    # --- batched: one call = thousands of ops -----------------------------
    rng = np.random.default_rng(0)
    B = 4096
    sk_a = jnp.asarray(rng.integers(0, 256, (B, 32), dtype=np.uint8))
    sk_b = jnp.asarray(rng.integers(0, 256, (B, 32), dtype=np.uint8))
    pk_a = x25519.calculate_public_key_fast(sk_a)
    pk_b = x25519.calculate_public_key_fast(sk_b)
    assert np.array_equal(np.asarray(x25519.create_shared_key(pk_b, sk_a)),
                          np.asarray(x25519.create_shared_key(pk_a, sk_b)))
    print(f"{B} batched DH exchanges agree")

    seed = jnp.asarray(rng.integers(0, 256, (B, 32), dtype=np.uint8))
    msg = jnp.asarray(rng.integers(0, 256, (B, 64), dtype=np.uint8))
    pk, priv = ed25519.create_keypair(seed)
    sigs = ed25519.sign(priv, msg)
    ctx = ed25519.verify_init(pk)           # cacheable per-pubkey phase
    ok = ed25519.verify_check(ctx, sigs, msg)
    print(f"{int(np.asarray(ok).sum())}/{B} batched signatures verified")


if __name__ == "__main__":
    main()
