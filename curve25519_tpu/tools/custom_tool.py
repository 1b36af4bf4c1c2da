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
    """Generate + self-verify a sign test vector using the pure-python model
    (independent oracle) — mirrors custom_tool t."""
    from curve25519_tpu import refmodel
    sk = hashlib.sha512(seed).digest()[:32]
    pk, priv = refmodel.ed_keypair(sk)
    sig = refmodel.ed_sign(priv, msg)
    ok = refmodel.ed_verify(sig, pk, msg)
    print(f"sk  = {sk.hex()}")
    print(f"pk  = {pk.hex()}")
    print(f"msg = {msg.hex()}")
    print(f"sig = {sig.hex()}")
    print(f"verified = {ok}")
    return 0 if ok else 1


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
