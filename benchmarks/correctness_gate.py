"""Correctness gate for the benchmark harnesses.

The reference refuses to run speed_test until donna's public key matches
bit-exactly (reference: test/curve25519_test.c:143-154); same policy here —
every benched op first has a slice of its device output checked against an
independent host oracle (the native C++ core when buildable, the pure-python
refmodel otherwise), so a miscompiled kernel can never publish a fast wrong
number. Each JSON row then carries ``"verified": true`` plus the oracle used.
"""

import hashlib

import numpy as np

_BASE_U = bytes([9] + [0] * 31)


class Oracle:
    """Uniform host-oracle facade over native bindings / python refmodel."""

    def __init__(self):
        try:
            from curve25519_tpu.native import bindings as nb
            nb.load()
            self._nb = nb
            self.label = "native-c++"
        except Exception:
            self._nb = None
            self.label = "python-refmodel"
        if self._nb is None:
            from curve25519_tpu import refmodel
            self._rm = refmodel

    def x25519(self, sk, peer):
        return (self._nb.x25519(sk, peer) if self._nb
                else self._rm.x25519(sk, peer))

    def x25519_base(self, sk):
        return self.x25519(sk, _BASE_U)

    def ed_keypair(self, sk):
        return (self._nb.ed25519_keypair(sk) if self._nb
                else self._rm.ed_keypair(sk))

    def ed_sign(self, priv, msg):
        return (self._nb.ed25519_sign(priv, msg) if self._nb
                else self._rm.ed_sign(priv, msg))

    def ed_verify(self, sig, pk, msg):
        if self._nb:
            return self._nb.ed25519_verify(sig, pk, msg)
        from curve25519_tpu import refmodel
        return refmodel.ed_verify(sig, pk, msg)

    def sha512(self, msg):
        return hashlib.sha512(msg).digest()


def check_rows(name, got, want_rows):
    """got: [B, N] uint8 device output (numpy); want_rows: list of expected
    bytes for the first len(want_rows) lanes. Raises on any mismatch."""
    got = np.asarray(got)
    for i, want in enumerate(want_rows):
        have = bytes(got[i].tolist())
        if have != want:
            raise AssertionError(
                f"benchmark correctness gate FAILED for {name!r} lane {i}: "
                f"device={have.hex()} oracle={want.hex()} — refusing to "
                f"publish timings for unvalidated output")
