"""Hardened random byte source.

Equivalent of the reference's "paranoid" RNG (reference: custom/random.c:43-85):
OS entropy post-whitened through SHA-512 keyed with a package-local secret, so
a weak/compromised OS RNG still yields unpredictable-looking output. Used by
the custom tool and the OO wrapper's random keygen — never on the TPU hot path.
"""

import os
import struct
import time

_POOL_KEY = b"curve25519-tpu/hardened-rng/v1"


def get_random_bytes(n: int) -> bytes:
    """n hardened random bytes (multiples of 64 generated per SHA-512 round)."""
    from curve25519_tpu.ops.sha512 import Sha512  # our own SHA-512
    out = bytearray()
    counter = 0
    while len(out) < n:
        h = Sha512()
        h.update(_POOL_KEY)
        h.update(os.urandom(64))
        h.update(struct.pack("<dQ", time.time(), counter))
        out += h.final()
        counter += 1
    return bytes(out[:n])
