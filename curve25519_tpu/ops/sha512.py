"""Batched SHA-512 on TPU as uint32 (hi, lo) pairs.

TPU-native re-design of the reference's OpenSSL-derived streaming SHA-512
(reference: source/sha512.c). TPUs have no native 64-bit integers, so every
64-bit word is a pair of uint32 lanes packed in the trailing axis of shape
``[..., 2]`` (hi, lo); adds propagate carries explicitly and rotates are paired
shifts — all VPU elementwise ops, fully vectorized over message batches.

Variable-length messages live in fixed-shape padded byte tensors with a
per-message length; padding placement and the final-block selection are
computed with masks (no data-dependent shapes), which is the fixed-shape
batched answer to the reference's sequential Update/Final streaming
(source/sha512.c:118-157). A message's hash chain is inherently sequential, so
throughput comes from batching across messages — see SURVEY.md §5.

Constants are derived from first principles (fractional parts of sqrt/cbrt of
the first primes, FIPS 180-4) rather than embedded tables.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["sha512", "sha512_bytes", "Sha512", "DIGEST_LEN", "BLOCK_LEN"]

DIGEST_LEN = 64
BLOCK_LEN = 128


# ---------------------------------------------------------------------------
# Constant generation (FIPS 180-4 §4.2.3 / §5.3.5)
# ---------------------------------------------------------------------------
def _primes(n):
    ps, c = [], 2
    while len(ps) < n:
        if all(c % p for p in ps):
            ps.append(c)
        c += 1
    return ps


def _icbrt(n):
    x = int(round(n ** (1 / 3))) + 2
    while x * x * x > n:
        x -= 1
    while (x + 1) ** 3 <= n:
        x += 1
    return x


_H0 = [math.isqrt(p << 128) & ((1 << 64) - 1) for p in _primes(8)]
_K = [_icbrt(p << 192) & ((1 << 64) - 1) for p in _primes(80)]
assert _H0[0] == 0x6A09E667F3BCC908 and _H0[7] == 0x5BE0CD19137E2179
assert _K[0] == 0x428A2F98D728AE22 and _K[79] == 0x6C44198C4A475817

_H0_HL = np.array([[h >> 32, h & 0xFFFFFFFF] for h in _H0], dtype=np.uint32)
_K_HL = np.array([[k >> 32, k & 0xFFFFFFFF] for k in _K], dtype=np.uint32)


# ---------------------------------------------------------------------------
# 64-bit ops on [..., 2] uint32 (hi, lo)
# ---------------------------------------------------------------------------
def _add64(a, b):
    lo = a[..., 1] + b[..., 1]
    carry = (lo < a[..., 1]).astype(jnp.uint32)
    hi = a[..., 0] + b[..., 0] + carry
    return jnp.stack([hi, lo], axis=-1)


def _rotr64(x, n):
    hi, lo = x[..., 0], x[..., 1]
    if n == 32:
        return jnp.stack([lo, hi], axis=-1)
    if n > 32:
        hi, lo, n = lo, hi, n - 32
    nh = jnp.uint32(n)
    mh = jnp.uint32(32 - n)
    return jnp.stack([(hi >> nh) | (lo << mh), (lo >> nh) | (hi << mh)], axis=-1)


def _shr64(x, n):
    hi, lo = x[..., 0], x[..., 1]
    if n >= 32:
        return jnp.stack([jnp.zeros_like(hi), hi >> jnp.uint32(n - 32)], axis=-1)
    nh = jnp.uint32(n)
    mh = jnp.uint32(32 - n)
    return jnp.stack([hi >> nh, (lo >> nh) | (hi << mh)], axis=-1)


def _sigma0(x):  # rotr 1 ^ rotr 8 ^ shr 7
    return _rotr64(x, 1) ^ _rotr64(x, 8) ^ _shr64(x, 7)


def _sigma1(x):  # rotr 19 ^ rotr 61 ^ shr 6
    return _rotr64(x, 19) ^ _rotr64(x, 61) ^ _shr64(x, 6)


def _Sigma0(x):  # rotr 28 ^ rotr 34 ^ rotr 39
    return _rotr64(x, 28) ^ _rotr64(x, 34) ^ _rotr64(x, 39)


def _Sigma1(x):  # rotr 14 ^ rotr 18 ^ rotr 41
    return _rotr64(x, 14) ^ _rotr64(x, 18) ^ _rotr64(x, 41)


# ---------------------------------------------------------------------------
# Block transform (reference SHA512_Transform, source/sha512.c:226)
# ---------------------------------------------------------------------------
def _transform(state, block_words):
    """state: [..., 8, 2]; block_words: [..., 16, 2]. Returns new state.

    The 80 rounds run as a `lax.scan` carrying (working vars, rolling 16-word
    message-schedule window): a fixed-size traced graph (vs ~26k HLO ops when
    unrolled), which XLA compiles in seconds and executes as a tight loop —
    per-round ops are [batch]-wide VPU vectors."""
    kt_xs = jnp.asarray(_K_HL)                       # [80, 2]
    tidx = jnp.arange(80, dtype=jnp.int32)

    def body(carry, xs):
        vars8, win = carry                           # [..., 8, 2], [..., 16, 2]
        kt, t = xs
        # message schedule: w_t = block word for t<16, recurrence after
        wrec = _add64(_add64(_sigma1(win[..., 14, :]), win[..., 9, :]),
                      _add64(_sigma0(win[..., 1, :]), win[..., 0, :]))
        w = jnp.where(t < 16, win[..., 0, :], wrec)
        # for t<16 the window already holds the block words; keep it rolling
        win = jnp.concatenate(
            [win[..., 1:, :], jnp.where(t < 16, win[..., 0:1, :], wrec[..., None, :])],
            axis=-2)
        a, b, c, d, e, f, g, h = (vars8[..., i, :] for i in range(8))
        t1 = _add64(_add64(h, _Sigma1(e)),
                    _add64((e & f) ^ (~e & g), _add64(kt, w)))
        t2 = _add64(_Sigma0(a), (a & b) ^ (a & c) ^ (b & c))
        new = jnp.stack([_add64(t1, t2), a, b, c, _add64(d, t1), e, f, g],
                        axis=-2)
        return (new, win), None

    (vars8, _), _ = jax.lax.scan(body, (state, block_words), (kt_xs, tidx))
    return _add64(state, vars8)


def _nblocks_static(max_len):
    return (max_len + 17 + BLOCK_LEN - 1) // BLOCK_LEN


def _pad_and_pack(msg, length):
    """FIPS 180-4 padding + byte->big-endian-word packing with masks.

    Returns (words [..., nb, 16, 2] uint32, nblocks [...] int32 active block
    counts, nb static block count)."""
    max_len = msg.shape[-1]
    batch_shape = msg.shape[:-1]
    nb = _nblocks_static(max_len)
    total = nb * BLOCK_LEN

    # Build the padded byte stream with masks.
    data = jnp.zeros(batch_shape + (total,), dtype=jnp.uint8)
    data = data.at[..., :max_len].set(msg)
    idx = jnp.arange(total, dtype=jnp.int32)
    len_b = length[..., None]
    data = jnp.where(idx < len_b, data, jnp.uint8(0))
    data = jnp.where(idx == len_b, jnp.uint8(0x80), data)

    # 128-bit big-endian bit-length field at the end of the last active block
    # (we populate the low 64 bits; per-message int32 lengths give < 2^34
    # bits, split into uint32 halves so lengths >= 2^29 bytes stay exact).
    nblocks = (length + 17 + BLOCK_LEN - 1) // BLOCK_LEN
    len_pos = nblocks[..., None] * BLOCK_LEN - 8     # first of 8 length bytes
    bitlen_hi = (length >> 29).astype(jnp.uint32)
    bitlen_lo = length.astype(jnp.uint32) << 3
    # big-endian: byte k (k=0..3) from the hi half, k (4..7) from the lo
    k = idx - len_pos
    in_field = (k >= 0) & (k < 8)
    kk = jnp.where(in_field, k, 0)
    half = jnp.where(kk < 4, bitlen_hi[..., None], bitlen_lo[..., None])
    shift = ((3 - (kk & 3)) * 8).astype(jnp.uint32)
    len_byte = ((half >> shift) & 0xFF).astype(jnp.uint8)
    data = jnp.where(in_field, len_byte, data)

    # bytes -> big-endian 64-bit words: [..., nb, 16, 2]
    blocks = data.reshape(batch_shape + (nb, 16, 2, 4)).astype(jnp.uint32)
    weights = jnp.asarray([1 << 24, 1 << 16, 1 << 8, 1], dtype=jnp.uint32)
    words = jnp.sum(blocks * weights, axis=-1)       # [..., nb, 16, 2]
    return words, nblocks, nb


def sha512(msg, length=None, prefix=None):
    """Batched SHA-512.

    msg: ``[..., L]`` uint8 tensor (L static). length: ``[...]`` int32 actual
    byte lengths (defaults to L everywhere). Returns ``[..., 64]`` uint8
    digests. Messages shorter than L are padded per FIPS 180-4 using masks;
    blocks past a message's end leave its hash state untouched.

    prefix: optional ``[..., P]`` uint8 (P static, P % 4 == 0, all P bytes
    live) logically prepended to every message — hash(prefix || msg). The
    protocol layers pass their fixed-size headers (Ed25519's key prefix /
    enc(R) || pk) this way so the TPU path can assemble the stream in the
    u32 word domain instead of concatenating uint8 tensors (byte-domain
    concat/pad ops relayout on TPU — the dominant non-kernel cost of the
    sign path before this, PERF.md §5).

    Flat TPU batches >= 1024 route through the Pallas compression kernel
    (ops/pallas/sha512_kernel.py); the jnp path below is the portable
    implementation with identical semantics.
    """
    msg = jnp.asarray(msg, dtype=jnp.uint8)
    batch_shape = msg.shape[:-1]
    if prefix is not None:
        prefix = jnp.asarray(prefix, dtype=jnp.uint8)
        batch_shape = jnp.broadcast_shapes(batch_shape, prefix.shape[:-1])
    max_len = msg.shape[-1]
    if length is None:
        length = jnp.full(batch_shape, max_len, dtype=jnp.int32)
    else:
        length = jnp.asarray(length, dtype=jnp.int32)

    from curve25519_tpu.ops.pallas import use_pallas
    if use_pallas(batch_shape):
        from curve25519_tpu.ops.pallas import sha512_kernel
        return sha512_kernel.sha512_pallas(
            jnp.broadcast_to(msg, batch_shape + (max_len,)), length,
            prefix=prefix)

    if prefix is not None:
        # portable path: plain byte concatenation, identical semantics
        plen = prefix.shape[-1]
        msg = jnp.concatenate(
            [jnp.broadcast_to(prefix, batch_shape + (plen,)),
             jnp.broadcast_to(msg, batch_shape + (max_len,))], axis=-1)
        max_len += plen
        length = length + plen

    words, nblocks, nb = _pad_and_pack(msg, length)

    state0 = jnp.broadcast_to(jnp.asarray(_H0_HL), batch_shape + (8, 2))
    # match device-variance with the message data (shard_map scan carries)
    vary = (words[..., :1, :1, :1] ^ words[..., :1, :1, :1])
    state0 = state0 ^ vary[..., 0, :, :]

    # scan over blocks; inactive blocks are masked out
    words_scan = jnp.moveaxis(words, len(batch_shape), 0)  # [nb, ..., 16, 2]

    def body(carry, inp):
        st = carry
        blk, bi = inp
        new = _transform(st, blk)
        active = (bi < nblocks)[..., None, None]
        return jnp.where(active, new, st), None

    bidx = jnp.arange(nb, dtype=jnp.int32)
    state, _ = jax.lax.scan(body, state0, (words_scan, bidx))

    # state -> big-endian digest bytes [..., 64]
    st = state.reshape(batch_shape + (16,))          # 16 uint32, big-end order
    sh = jnp.asarray([24, 16, 8, 0], dtype=jnp.uint32)
    by = (st[..., :, None] >> sh) & 0xFF
    return by.reshape(batch_shape + (64,)).astype(jnp.uint8)


# ---------------------------------------------------------------------------
# Host-side convenience (single message / streaming)
# ---------------------------------------------------------------------------
def sha512_bytes(data: bytes) -> bytes:
    """Hash one host-side byte string through the batched kernel.

    Pinned to CPU: this is a host utility (tools/RNG); pushing one small hash
    through the accelerator would pay a compile + transfer for nothing."""
    with jax.default_device(jax.devices("cpu")[0]):
        arr = jnp.asarray(np.frombuffer(data, dtype=np.uint8))[None, :] \
            if data else jnp.zeros((1, 0), jnp.uint8)
        out = sha512(arr, jnp.asarray([len(data)], jnp.int32))
        return bytes(np.asarray(out)[0].tolist())


class Sha512:
    """Streaming Init/Update/Final (the reference API shape,
    source/sha512.h:85-87) in O(1) MEMORY: between calls only the 8-word
    hash state, a <128-byte tail, and the running byte count are carried —
    the same invariant as the reference's SHA512_Update/Final
    (source/sha512.c:67-157). Arbitrary stream lengths: the final length
    field is assembled host-side from an exact python int, so the 2^61-byte
    class of the reference is comfortably covered (tested across 2^31).

    Backend: the native host core's streaming context when available
    (GB/s-class, the single-op latency regime); otherwise the batched jnp
    transform absorbing fixed-size masked chunks on the CPU backend (one
    compiled graph reused for every chunk). CURVE25519_TPU_HOST_NATIVE=0
    pins the jnp path (same switch as oo.py)."""

    _CHUNK_BLOCKS = 512          # jnp fallback absorbs 64 KiB per graph call

    def __init__(self):
        import os
        self._native = None
        if os.environ.get("CURVE25519_TPU_HOST_NATIVE", "1") != "0":
            try:
                from curve25519_tpu.native import bindings
                self._native = bindings.Sha512Stream()
            except Exception:
                self._native = None
        self._state = np.array(_H0_HL)               # [8, 2] uint32
        self._tail = bytearray()
        self._total = 0

    def update(self, data):
        data = bytes(data)
        self._total += len(data)
        if self._native is not None:
            self._native.update(data)
            return self
        self._tail += data
        nfull = len(self._tail) // BLOCK_LEN
        if nfull:
            self._absorb(bytes(self._tail[:nfull * BLOCK_LEN]))
            del self._tail[:nfull * BLOCK_LEN]
        return self

    def _absorb(self, block_bytes):
        """Run whole blocks through the jnp transform in fixed-shape masked
        chunks (every distinct chunk count would be a fresh XLA compile;
        padding to _CHUNK_BLOCKS keeps it to one cached graph)."""
        nb = len(block_bytes) // BLOCK_LEN
        # read big-endian words, then convert to native uint32 (jax rejects
        # non-native-endian dtypes)
        words = np.frombuffer(block_bytes, ">u4").astype(
            np.uint32).reshape(nb, 16, 2)
        for ofs in range(0, nb, self._CHUNK_BLOCKS):
            chunk = words[ofs:ofs + self._CHUNK_BLOCKS]
            n = chunk.shape[0]
            if n < self._CHUNK_BLOCKS:
                chunk = np.concatenate(
                    [chunk, np.zeros((self._CHUNK_BLOCKS - n, 16, 2),
                                     np.uint32)], 0)
            self._state = np.asarray(_absorb_chunk_jit(
                jnp.asarray(self._state), jnp.asarray(chunk),
                jnp.int32(n)))

    def final(self) -> bytes:
        if self._native is not None:
            return self._native.final()
        # FIPS 180-4 final padding from the EXACT host-side length
        fill = self._total % BLOCK_LEN
        padlen = (112 - fill) if fill < 112 else (240 - fill)
        trailer = b"\x80" + b"\x00" * (padlen - 1) + \
            (self._total * 8).to_bytes(16, "big")
        self._absorb(bytes(self._tail) + trailer)
        self._tail.clear()
        return self._state.astype(">u4").tobytes()


def _absorb_chunk(state, words, n):
    """state [8, 2] u32; words [CHUNK, 16, 2]; blocks >= n leave state."""

    def body(st, inp):
        blk, bi = inp
        new = _transform(st, blk)
        return jnp.where(bi < n, new, st), None

    idx = jnp.arange(words.shape[0], dtype=jnp.int32)
    st, _ = jax.lax.scan(body, state, (words, idx))
    return st


_absorb_chunk_cache = None


def _absorb_chunk_jit(state, words, n):
    """CPU-pinned cached jit of _absorb_chunk (host facade: pushing host
    streaming through the accelerator would pay a transfer per chunk)."""
    global _absorb_chunk_cache
    if _absorb_chunk_cache is None:
        _absorb_chunk_cache = jax.jit(_absorb_chunk)
    with jax.default_device(jax.devices("cpu")[0]):
        return _absorb_chunk_cache(state, words, n)
