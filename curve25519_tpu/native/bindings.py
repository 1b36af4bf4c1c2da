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
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC",
           "-o", str(_SO), str(_SRC)]
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
    lib.c25519_ed25519_keypair_fast.argtypes = [u8p, u8p, u8p]
    lib.c25519_ed25519_sign_fast.argtypes = [u8p, u8p, u8p, ctypes.c_uint64]
    lib.c25519_x25519_base_fast.argtypes = [u8p, u8p]
    vp = ctypes.c_void_p
    lib.c25519_sha512_ctx_size.restype = ctypes.c_uint64
    lib.c25519_sha512_init.argtypes = [vp]
    lib.c25519_sha512_update.argtypes = [vp, u8p, ctypes.c_uint64]
    lib.c25519_sha512_final.argtypes = [vp, u8p]
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


class Sha512Stream:
    """Streaming SHA-512 over the native core: O(1) memory (the 200-byte
    sha512_ctx), any stream length up to 2^64-1 bytes."""

    def __init__(self):
        lib = load()
        self._lib = lib
        self._ctx = ctypes.create_string_buffer(
            int(lib.c25519_sha512_ctx_size()))
        lib.c25519_sha512_init(ctypes.cast(self._ctx, ctypes.c_void_p))

    def update(self, data):
        data = bytes(data)
        if data:
            # zero-copy: point straight at the bytes object's buffer
            p = ctypes.cast(ctypes.c_char_p(data),
                            ctypes.POINTER(ctypes.c_uint8))
            self._lib.c25519_sha512_update(
                ctypes.cast(self._ctx, ctypes.c_void_p), p, len(data))
        return self

    def final(self) -> bytes:
        out = _out(64)
        self._lib.c25519_sha512_final(
            ctypes.cast(self._ctx, ctypes.c_void_p), out)
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


def x25519_base_fast(sk: bytes) -> bytes:
    """Folding-8 X25519 public key (Edwards multiply + birational map) —
    the single-op latency record path. Bit-identical to x25519_base."""
    lib = load()
    out = _out(32)
    lib.c25519_x25519_base_fast(out, _buf(sk))
    return bytes(out)


def ed25519_keypair_fast(sk: bytes):
    """Folding-8 keygen; bit-identical to ed25519_keypair."""
    lib = load()
    pk, priv = _out(32), _out(64)
    lib.c25519_ed25519_keypair_fast(pk, priv, _buf(sk))
    return bytes(pk), bytes(priv)


def ed25519_sign_fast(priv: bytes, msg: bytes) -> bytes:
    """Folding-8 sign; bit-identical to ed25519_sign."""
    lib = load()
    sig = _out(64)
    lib.c25519_ed25519_sign_fast(
        sig, _buf(priv), _buf(msg) if msg else (ctypes.c_uint8 * 1)(),
        len(msg))
    return bytes(sig)


def ed25519_verify(sig: bytes, pk: bytes, msg: bytes) -> bool:
    lib = load()
    return bool(lib.c25519_ed25519_verify(
        _buf(sig), _buf(pk),
        _buf(msg) if msg else (ctypes.c_uint8 * 1)(), len(msg)))
