"""Build-time customization CLI — the reference custom_tool equivalent
(reference: custom/main.c:143-165).

Subcommands:
    b           regenerate the package's static blinding context
                (curve25519_tpu/_custom_blind.py; the analogue of custom_tool
                regenerating source/custom_blind.h every build,
                source/Makefile:31)
    r NAME [N]  emit N hardened random bytes as a python constant
    t [SEED] MSG  generate a keygen/sign/verify test vector and self-verify
                (reference CreateSignTestVector, custom/main.c:106-141)

Usage: python -m curve25519_tpu.tools.custom_tool {b|r|t} [...]
"""

import sys
import hashlib
from pathlib import Path

from curve25519_tpu.config import ELL
from curve25519_tpu.utils.rng import get_random_bytes

_BLIND_PATH = Path(__file__).resolve().parent.parent / "_custom_blind.py"


def create_blinding_source(seed: bytes) -> str:
    """Generate the static-blinder module text from a seed, chained through
    the bootstrap context (reference CreateBlindingContext, custom/main.c:69)."""
    from curve25519_tpu.models import blinding
    ctx = blinding.blinding_init(seed, parent=blinding._bootstrap())
    b = ctx["_b"]
    x, y = ctx["_bp_point"]
    return (
        '"""Static build-time blinding context. GENERATED - do not edit.\n\n'
        "Regenerate with: python -m curve25519_tpu.tools.custom_tool b\n"
        '(reference analogue: source/custom_blind.h, rebuilt every make)"""\n\n'
        f"BL = {(ELL - b) % ELL}\n"
        f"ZR_BYTES = {list(ctx['_zr_bytes'])}\n"
        f"BP_X = {x}\n"
        f"BP_Y = {y}\n"
    )


def cmd_blind():
    src = create_blinding_source(get_random_bytes(64))
    _BLIND_PATH.write_text(src)
    print(f"wrote {_BLIND_PATH}")


def cmd_random(name, n=32):
    data = get_random_bytes(n)
    print(f"{name} = {list(data)}")


def cmd_testvector(seed: bytes, msg: bytes):
    """Generate a sign test vector and round-trip it through EVERY
    implementation path: the pure-python oracle, the production JAX path
    (keygen + sign must reproduce the same bytes, verify must accept), and
    the native host core when buildable. The reference's tool likewise
    links and verifies through the real library, not a model
    (custom/main.c:106-141). Exits non-zero if any path disagrees."""
    from curve25519_tpu import refmodel
    sk = hashlib.sha512(seed).digest()[:32]
    pk, priv = refmodel.ed_keypair(sk)
    sig = refmodel.ed_sign(priv, msg)
    checks = {"refmodel": refmodel.ed_verify(sig, pk, msg)}

    # production JAX path: same keypair, same signature, verifies True
    import numpy as np
    import jax.numpy as jnp
    from curve25519_tpu.models import ed25519

    def _b(x):
        return bytes(np.asarray(x).reshape(-1).tolist())

    skj = jnp.asarray(np.frombuffer(sk, np.uint8))
    pkj, privj = ed25519.create_keypair(skj)
    msgj = (jnp.asarray(np.frombuffer(msg, np.uint8)) if msg
            else jnp.zeros((0,), jnp.uint8))
    sigj = ed25519.sign(privj, msgj)
    checks["jax-keygen"] = _b(pkj) == pk and _b(privj) == priv
    checks["jax-sign"] = _b(sigj) == sig
    checks["jax-verify"] = bool(np.asarray(
        ed25519.verify(jnp.asarray(np.frombuffer(sig, np.uint8)), pkj,
                       msgj)))

    # native host core (skipped only if the toolchain can't build it)
    try:
        from curve25519_tpu.native import bindings
        pk_n, priv_n = bindings.ed25519_keypair(sk)
        checks["native-keygen"] = (pk_n, priv_n) == (pk, priv)
        checks["native-sign"] = bindings.ed25519_sign(priv, msg) == sig
        checks["native-verify"] = bindings.ed25519_verify(sig, pk, msg)
    except Exception as e:  # no g++ — report, don't silently pass
        print(f"native path unavailable ({e!r})")

    print(f"sk  = {sk.hex()}")
    print(f"pk  = {pk.hex()}")
    print(f"msg = {msg.hex()}")
    print(f"sig = {sig.hex()}")
    for name, ok in checks.items():
        print(f"verified[{name}] = {bool(ok)}")
    return 0 if all(checks.values()) else 1


def main(argv=None):
    argv = sys.argv[1:] if argv is None else argv
    if not argv:
        print(__doc__)
        return 2
    cmd = argv[0]
    if cmd == "b":
        cmd_blind()
        return 0
    if cmd == "r":
        cmd_random(argv[1] if len(argv) > 1 else "random_bytes",
                   int(argv[2]) if len(argv) > 2 else 32)
        return 0
    if cmd == "t":
        if len(argv) >= 3:
            return cmd_testvector(argv[1].encode(), argv[2].encode())
        return cmd_testvector(get_random_bytes(32), argv[1].encode())
    print(__doc__)
    return 2


if __name__ == "__main__":
    sys.exit(main())
