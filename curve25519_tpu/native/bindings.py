"""ctypes bindings for the native host core (builds on first use).

The reference ships its native backend as a static library wired into make
(reference: source/asm64/Makefile); here the shared object is compiled on
demand with g++ (no pybind11 dependency — plain C ABI + ctypes).
"""

import ctypes
import subprocess
from pathlib import Path

_DIR = Path(__file__).resolve().parent
_SRC = _DIR / "ref25519.cpp"
_SO = _DIR / "libref25519.so"

_lib = None


def _build():
    cmd = ["g++", "-O2", "-shared", "-fPIC", "-o", str(_SO), str(_SRC)]
    subprocess.run(cmd, check=True, capture_output=True)


def load():
    """Load (building if needed) the native library; returns the ctypes CDLL."""
    global _lib
    if _lib is not None:
        return _lib
    if not _SO.exists() or _SO.stat().st_mtime < _SRC.stat().st_mtime:
        _build()
    lib = ctypes.CDLL(str(_SO))
    u8p = ctypes.POINTER(ctypes.c_uint8)
    lib.c25519_x25519.argtypes = [u8p, u8p, u8p]
    lib.c25519_x25519_base.argtypes = [u8p, u8p]
    lib.c25519_sha512.argtypes = [u8p, u8p, ctypes.c_uint64]
    lib.c25519_ed25519_keypair.argtypes = [u8p, u8p, u8p]
    lib.c25519_ed25519_sign.argtypes = [u8p, u8p, u8p, ctypes.c_uint64]
    lib.c25519_ed25519_verify.argtypes = [u8p, u8p, u8p, ctypes.c_uint64]
    lib.c25519_ed25519_verify.restype = ctypes.c_int
    _lib = lib
    return lib


def _buf(data: bytes):
    return (ctypes.c_uint8 * len(data)).from_buffer_copy(data)


def _out(n):
    return (ctypes.c_uint8 * n)()


def x25519(sk: bytes, peer_pk: bytes) -> bytes:
    lib = load()
    out = _out(32)
    lib.c25519_x25519(out, _buf(peer_pk), _buf(sk))
    return bytes(out)


def x25519_base(sk: bytes) -> bytes:
    lib = load()
    out = _out(32)
    lib.c25519_x25519_base(out, _buf(sk))
    return bytes(out)


def sha512(msg: bytes) -> bytes:
    lib = load()
    out = _out(64)
    lib.c25519_sha512(out, _buf(msg) if msg else (ctypes.c_uint8 * 1)(), len(msg))
    return bytes(out)


def ed25519_keypair(sk: bytes):
    lib = load()
    pk, priv = _out(32), _out(64)
    lib.c25519_ed25519_keypair(pk, priv, _buf(sk))
    return bytes(pk), bytes(priv)


def ed25519_sign(priv: bytes, msg: bytes) -> bytes:
    lib = load()
    sig = _out(64)
    lib.c25519_ed25519_sign(sig, _buf(priv),
                            _buf(msg) if msg else (ctypes.c_uint8 * 1)(),
                            len(msg))
    return bytes(sig)


def ed25519_verify(sig: bytes, pk: bytes, msg: bytes) -> bool:
    lib = load()
    return bool(lib.c25519_ed25519_verify(
        _buf(sig), _buf(pk),
        _buf(msg) if msg else (ctypes.c_uint8 * 1)(), len(msg)))
