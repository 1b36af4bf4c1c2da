"""Pallas SHA-512 compression kernel.

The batched jnp path (ops/sha512.py) keeps 64-bit words as [..., 2] uint32
pairs whose tiny trailing axes waste VPU lanes and whose 80-round scan
round-trips HBM. Here each grid block owns TILE_BATCH = 1024 messages laid
out as [8, 128] uint32 tiles — one full VPU tile per word-half — with the
compression running in VMEM/registers: the 80 rounds are python-unrolled so
the round constants are vector immediates (an SMEM load per round serializes
the pipeline), and the 16-word schedule lives in a rotating python list of
tiles. Long messages stream through a second (sequential) grid axis of
CHUNK_BLOCKS-block chunks with the hash state carried in the output block,
so VMEM holds O(chunk) — message length is bounded only by HBM and the
int32 byte-length field (< 2^31 bytes).

FIPS 180-4 padding runs on the host side of the kernel boundary but in the
*word* domain: bytes are packed to big-endian uint32 words first (one
reshape + weighted sum), then the 0x80 marker / zero fill / 128-bit length
field are applied per word with masks — far cheaper than masking a uint8
stream (8-bit ops relayout on TPU).

Reference anchor: SHA512_Transform (source/sha512.c:226).
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from curve25519_tpu.ops import sha512 as sha_jnp
from curve25519_tpu.ops.pallas import fe_tile as ft

__all__ = ["sha512_blocks_tiled", "sha512_pallas"]


def _add64(ah, al, bh, bl):
    lo = al + bl
    c = (lo < al).astype(jnp.uint32)
    return ah + bh + c, lo


def _rotr(h, l, n):
    if n == 32:
        return l, h
    if n > 32:
        h, l, n = l, h, n - 32
    n = jnp.uint32(n)
    m = jnp.uint32(32) - n
    return (h >> n) | (l << m), (l >> n) | (h << m)


def _shr(h, l, n):
    if n >= 32:
        return jnp.zeros_like(h), h >> jnp.uint32(n - 32)
    n = jnp.uint32(n)
    m = jnp.uint32(32) - n
    return h >> n, (l >> n) | (h << m)


def _xor3(a, b, c):
    return (a[0] ^ b[0] ^ c[0], a[1] ^ b[1] ^ c[1])


def _sigma0(h, l):
    return _xor3(_rotr(h, l, 1), _rotr(h, l, 8), _shr(h, l, 7))


def _sigma1(h, l):
    return _xor3(_rotr(h, l, 19), _rotr(h, l, 61), _shr(h, l, 6))


def _Sigma0(h, l):
    return _xor3(_rotr(h, l, 28), _rotr(h, l, 34), _rotr(h, l, 39))


def _Sigma1(h, l):
    return _xor3(_rotr(h, l, 14), _rotr(h, l, 18), _rotr(h, l, 41))


def _round(st, wh, wl, kh, kl):
    ah, al, bh, bl, ch_, cl, dh, dl, eh, el, fh, fl, gh, gl, hh, hl = st
    s1h, s1l = _Sigma1(eh, el)
    chh = (eh & fh) ^ (~eh & gh)
    chl = (el & fl) ^ (~el & gl)
    t1 = _add64(hh, hl, s1h, s1l)
    t1 = _add64(*t1, chh, chl)
    t1 = _add64(*t1, kh, kl)
    t1h, t1l = _add64(*t1, wh, wl)
    s0h, s0l = _Sigma0(ah, al)
    mjh = (ah & bh) ^ (ah & ch_) ^ (bh & ch_)
    mjl = (al & bl) ^ (al & cl) ^ (bl & cl)
    t2h, t2l = _add64(s0h, s0l, mjh, mjl)
    nah, nal = _add64(t1h, t1l, t2h, t2l)
    neh, nel = _add64(dh, dl, t1h, t1l)
    return (nah, nal, ah, al, bh, bl, ch_, cl,
            neh, nel, eh, el, fh, fl, gh, gl)


def _sha_kernel(w_ref, nb_ref, h0_ref, k_ref, out_ref, *, chunk, unroll):
    """One grid step compresses `chunk` blocks; the hash state is carried
    across chunks in out_ref (the chunk grid axis is ARBITRARY, so Mosaic
    keeps the same out block VMEM-resident between consecutive steps). VMEM
    therefore holds O(chunk) message words, not O(message) — the fixed-shape
    answer to the reference's constant-memory streaming Update
    (source/sha512.c:118-157)."""
    c = pl.program_id(1)
    nb_lane = nb_ref[0, 0]                       # [S, L] int32
    # H0 enters as a VMEM input: loop-carried state must originate from
    # loads — constant-derived carries get a replicated Mosaic layout that
    # cannot meet the loop body's concrete layout at the back-edge.
    # On chunk 0 start from H0; afterwards resume from the carried state
    # (out_ref is uninitialized on chunk 0 — the select discards it).
    first = c == 0
    st = tuple(jnp.where(first, h0_ref[0, i], out_ref[0, i])
               for i in range(16))

    def block_step(b, st):
        if unroll:
            # rounds fully unrolled: K as vector immediates (an SMEM load
            # per round stalls the VPU pipeline), rotating schedule window
            # as a python list. Mosaic compiles this in seconds; the XLA-CPU
            # interpreter does not — tests use the rolled form below.
            w = [(w_ref[0, b * 32 + 2 * t], w_ref[0, b * 32 + 2 * t + 1])
                 for t in range(16)]
            v = st
            for t in range(80):
                if t < 16:
                    wh, wl = w[t]
                else:
                    s1 = _sigma1(*w[(t - 2) % 16])
                    s0 = _sigma0(*w[(t - 15) % 16])
                    acc = _add64(*s1, *w[(t - 7) % 16])
                    acc = _add64(*acc, *s0)
                    wh, wl = _add64(*acc, *w[t % 16])
                    w[t % 16] = (wh, wl)
                v = _round(v, wh, wl, jnp.uint32(sha_jnp._K[t] >> 32),
                           jnp.uint32(sha_jnp._K[t] & 0xFFFFFFFF))
        else:
            # rolled form: K from SMEM, schedule window as loop carry
            def load(t, vv):
                wh = w_ref[0, b * 32 + 2 * t]
                wl = w_ref[0, b * 32 + 2 * t + 1]
                return _round(vv, wh, wl, k_ref[t, 0], k_ref[t, 1])

            v = jax.lax.fori_loop(0, 16, load, st)
            win = tuple(w_ref[0, b * 32 + i] for i in range(32))

            def recur(t, carry):
                vv, win = carry
                s1 = _sigma1(win[28], win[29])                    # w[t-2]
                s0 = _sigma0(win[2], win[3])                      # w[t-15]
                w = _add64(*_add64(*s1, win[18], win[19]),        # + w[t-7]
                           *_add64(*s0, win[0], win[1]))          # + w[t-16]
                vv = _round(vv, w[0], w[1], k_ref[t, 0], k_ref[t, 1])
                return vv, win[2:] + w

            v, _ = jax.lax.fori_loop(16, 80, recur, (v, win))

        # lanes whose message ended before this global block keep their state
        active = c * chunk + b < nb_lane
        new = []
        for i in range(8):
            nh, nl = _add64(st[2 * i], st[2 * i + 1],
                            v[2 * i], v[2 * i + 1])
            new.extend((nh, nl))
        return tuple(jnp.where(active, n, o) for n, o in zip(new, st))

    st = jax.lax.fori_loop(0, chunk, block_step, st)
    out_ref[0] = jnp.stack(st, axis=0)


# Default blocks per grid step: 16 blocks = 2 KiB/lane = 2 MiB of message
# words per [8, 128] tile in VMEM (double-buffered by the pipeline), far
# under the ~16 MiB budget regardless of message length.
CHUNK_BLOCKS = 16


@functools.partial(jax.jit,
                   static_argnames=("nblocks", "chunk", "interpret"))
def sha512_blocks_tiled(w_t, nb_t, nblocks, chunk=None, interpret=False):
    """w_t: [G, nblocks*32, 8, 128] uint32 big-endian padded block words
    (order: block, word 0..15, hi/lo); nb_t: [G, 1, 8, 128] int32 per-lane
    active block counts. Returns [G, 16, 8, 128] uint32 digest words.

    The kernel grids over ceil(nblocks/chunk) sequential chunk steps with
    the hash state carried in the output block, so VMEM usage is bounded by
    `chunk` blocks — message length is limited only by HBM (and the int32
    byte-length field: < 2^31 bytes per message)."""
    g = w_t.shape[0]
    if chunk is None:
        chunk = min(nblocks, CHUNK_BLOCKS)
    chunk = min(chunk, nblocks)
    nchunks = (nblocks + chunk - 1) // chunk
    if nchunks * chunk != nblocks:
        w_t = jnp.concatenate(
            [w_t, jnp.zeros((g, (nchunks * chunk - nblocks) * 32,
                             ft.TILE_S, ft.TILE_L), jnp.uint32)], axis=1)

    def spec(k, index_map):
        return pl.BlockSpec((1, k, ft.TILE_S, ft.TILE_L), index_map,
                            memory_space=pltpu.VMEM)

    h0 = jnp.broadcast_to(
        jnp.asarray(sha_jnp._H0_HL.reshape(16), jnp.uint32)[None, :, None,
                                                            None],
        (1, 16, ft.TILE_S, ft.TILE_L))
    k_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
    return pl.pallas_call(
        functools.partial(_sha_kernel, chunk=chunk, unroll=not interpret),
        grid=(g, nchunks),
        in_specs=[spec(chunk * 32, lambda i, c: (i, c, 0, 0)),
                  spec(1, lambda i, c: (i, 0, 0, 0)),
                  spec(16, lambda i, c: (0, 0, 0, 0)),
                  k_spec],
        out_specs=spec(16, lambda i, c: (i, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((g, 16, ft.TILE_S, ft.TILE_L),
                                       jnp.uint32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=(pltpu.GridDimensionSemantics.PARALLEL,
                                 pltpu.GridDimensionSemantics.ARBITRARY)),
        interpret=interpret,
    )(w_t, nb_t, h0, jnp.asarray(sha_jnp._K_HL))


def _pack4(x):
    """[B, 4k] uint8 -> [B, k] uint32 big-endian words."""
    b = x.shape[0]
    return jnp.sum(
        x.reshape(b, x.shape[-1] // 4, 4).astype(jnp.uint32)
        * jnp.asarray([1 << 24, 1 << 16, 1 << 8, 1], jnp.uint32), axis=-1)


def _pack_words(msg, length, prefix=None):
    """FIPS 180-4 padding in the uint32-word domain.

    msg: [B, L] uint8; length: [B] int32 — bytes of msg that are live.
    prefix: optional [B, P] uint8 (P % 4 == 0, all P bytes live) logically
    prepended to every message. Passing it here instead of concatenating
    byte tensors keeps the big buffers in the u32 word domain: uint8
    concat/pad ops relayout on TPU and were the dominant non-kernel cost
    of the sign path (PERF.md §5, trace evidence). Returns (words
    [B, nb*32] uint32 big-endian halves in (block, word, hi/lo) order,
    nblocks [B] int32, nb)."""
    b, max_len = msg.shape
    plen = 0 if prefix is None else prefix.shape[-1]
    assert plen % 4 == 0, "prefix length must be word-aligned"
    nb = sha_jnp._nblocks_static(max_len + plen)
    if nb > CHUNK_BLOCKS:
        # round up to a whole number of kernel chunks HERE (trailing zero
        # blocks are inert — masked by nblocks) so sha512_blocks_tiled never
        # has to concatenate-pad the full message-words buffer (at the 1024
        # x 1 MiB bench shape that copy was ~1 GiB of HBM traffic)
        nb = -(-nb // CHUNK_BLOCKS) * CHUNK_BLOCKS
    nw = nb * 32                                   # uint32 half-words
    length = length + plen                         # full-stream byte length

    # raw big-endian word view of prefix || msg || zeros — built by word
    # concatenation (the mask below zeroes any garbage past `length`)
    max4 = (max_len + 3) // 4 * 4
    msg4 = msg if max4 == max_len else jnp.concatenate(
        [msg, jnp.zeros((b, max4 - max_len), jnp.uint8)], axis=-1)
    parts = [] if prefix is None else [_pack4(prefix)]
    parts.append(_pack4(msg4))
    tail = nw - plen // 4 - max4 // 4
    if tail > 0:
        parts.append(jnp.zeros((b, tail), jnp.uint32))
    raw = jnp.concatenate(parts, axis=-1)[:, :nw]

    # bytes of stream remaining at each word: r >= 4 keep, r < 0 zero,
    # 0 <= r < 4 keep top r bytes and place the 0x80 marker at byte r
    widx = jnp.arange(nw, dtype=jnp.int32)
    r = length[:, None] - 4 * widx
    mask = jnp.where(
        r >= 4, jnp.uint32(0xFFFFFFFF),
        jnp.where(r == 3, jnp.uint32(0xFFFFFF00),
                  jnp.where(r == 2, jnp.uint32(0xFFFF0000),
                            jnp.where(r == 1, jnp.uint32(0xFF000000),
                                      jnp.uint32(0)))))
    pad80 = jnp.where(
        r == 0, jnp.uint32(0x80000000),
        jnp.where(r == 1, jnp.uint32(0x00800000),
                  jnp.where(r == 2, jnp.uint32(0x00008000),
                            jnp.where(r == 3, jnp.uint32(0x00000080),
                                      jnp.uint32(0)))))
    words = (raw & mask) | pad80

    # 128-bit big-endian length field: the last two half-words of the final
    # active block (we populate the low 64 bits; messages < 2^61 bytes)
    nblocks = (length + 17 + sha_jnp.BLOCK_LEN - 1) // sha_jnp.BLOCK_LEN
    last = nblocks[:, None] * 32
    bitlen_hi = (length >> 29).astype(jnp.uint32)
    bitlen_lo = length.astype(jnp.uint32) << 3
    words = jnp.where(widx == last - 2, bitlen_hi[:, None], words)
    words = jnp.where(widx == last - 1, bitlen_lo[:, None], words)
    return words, nblocks, nb


def sha512_pallas(msg, length=None, interpret=False, chunk=None,
                  prefix=None):
    """Batched SHA-512 via the Pallas compression kernel; same semantics as
    ops.sha512.sha512 for [..., L] uint8 batches (any batch shape — leading
    axes are flattened and restored; rank-1 single messages cost one padded
    tile). `prefix` ([..., P] uint8, P % 4 == 0, fully live) is logically
    prepended to each message in the word domain — see _pack_words.
    Message length is bounded by HBM and the int32 length field (< 2^31
    bytes), not VMEM — the kernel streams `chunk` blocks per grid step."""
    from curve25519_tpu.ops.pallas import flatten_batch

    msg = jnp.asarray(msg, dtype=jnp.uint8)
    batch = msg.shape[:-1]
    max_len = msg.shape[-1]
    b, unflatten = flatten_batch(batch)
    msg = msg.reshape(b, max_len)
    if length is None:
        length = jnp.full((b,), max_len, dtype=jnp.int32)
    else:
        length = jnp.broadcast_to(
            jnp.asarray(length, dtype=jnp.int32), batch).reshape(b)
    if prefix is not None:
        prefix = jnp.broadcast_to(
            jnp.asarray(prefix, jnp.uint8),
            batch + prefix.shape[-1:]).reshape(b, prefix.shape[-1])

    words, nblocks, nb = _pack_words(msg, length, prefix)  # [B, nb*32]

    bpad = ((b + ft.TILE_BATCH - 1) // ft.TILE_BATCH) * ft.TILE_BATCH
    g = bpad // ft.TILE_BATCH
    flat = jnp.concatenate(
        [words, jnp.zeros((bpad - b, nb * 32), jnp.uint32)], 0)
    nbl = jnp.concatenate(
        [nblocks[:, None], jnp.zeros((bpad - b, 1), jnp.int32)], 0)

    out_t = sha512_blocks_tiled(
        ft.tile_lanes(flat, g), ft.tile_lanes(nbl, g), nb, chunk=chunk,
        interpret=interpret)
    st = ft.untile_lanes(out_t)[:b]                  # [B, 16] uint32
    sh = jnp.asarray([24, 16, 8, 0], dtype=jnp.uint32)
    by = (st[..., :, None] >> sh) & 0xFF
    return unflatten(by.reshape(b, 64).astype(jnp.uint8))
