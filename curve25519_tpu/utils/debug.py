"""Observability helpers — hex dumpers used by test/benchmark failure paths,
equivalent to the reference's ecp_PrintHexBytes / ecp_PrintHexWords /
ecp_PrintBytes / ecp_PrintWords (reference: test/curve25519_test.c:55-118).

All accept bytes, numpy arrays, or jax arrays; batched inputs print one line
per lane. Field-element limb tensors can be rendered as the 256-bit integer
they encode via `hex_fe`.
"""

import numpy as np

__all__ = ["hex_bytes", "hex_words", "hex_fe", "print_hex_bytes",
           "print_hex_words", "print_fe"]


def _np_u8(x):
    if isinstance(x, (bytes, bytearray)):
        return np.frombuffer(bytes(x), np.uint8)
    a = np.asarray(x)
    if a.dtype != np.uint8:
        a = a.astype(np.uint8)
    return a


def hex_bytes(x, name=None):
    """Big-endian-style hex of little-endian byte strings, matching the
    reference dump format `name = 0x...` (curve25519_test.c:55-66)."""
    a = _np_u8(x)
    if a.ndim > 1:
        return "\n".join(hex_bytes(row, f"{name}[{i}]" if name else None)
                         for i, row in enumerate(a))
    s = "0x" + "".join(f"{b:02X}" for b in a[::-1])
    return f"{name} = {s}" if name else s


def hex_words(x, name=None):
    """Hex dump of 32-bit word arrays, most-significant word first
    (curve25519_test.c:68-79)."""
    a = np.asarray(x, dtype=np.uint64)
    if a.ndim > 1:
        return "\n".join(hex_words(row, f"{name}[{i}]" if name else None)
                         for i, row in enumerate(a))
    s = "0x" + "".join(f"{int(w):08X}" for w in a[::-1])
    return f"{name} = {s}" if name else s


def hex_fe(limbs, name=None, radix_bits=13):
    """Render limb tensors as the integer(s) they encode (mod nothing —
    weak-normalized values show their raw sum)."""
    a = np.asarray(limbs, dtype=object)
    if a.ndim > 1:
        return "\n".join(hex_fe(row, f"{name}[{i}]" if name else None,
                                radix_bits)
                         for i, row in enumerate(a))
    v = sum(int(l) << (radix_bits * i) for i, l in enumerate(a))
    s = hex(v)
    return f"{name} = {s}" if name else s


def print_hex_bytes(x, name=None):
    print(hex_bytes(x, name))


def print_hex_words(x, name=None):
    print(hex_words(x, name))


def print_fe(limbs, name=None):
    print(hex_fe(limbs, name))
