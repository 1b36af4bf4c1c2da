"""Pallas X25519 ladder kernel: the whole 254-step Montgomery ladder plus the
final field inversion in one kernel launch, with all state resident in VMEM.

Rationale (see /opt/skills/guides/pallas_guide.md): the jnp ladder runs ~2500
field multiplies as separate XLA ops whose [B, 20] operands keep the 20-limb
axis on the 128-lane minor dimension (6.4x lane waste) and round-trip HBM
between scan steps. Here each kernel block owns TILE_BATCH = 1024 ladder
lanes laid out as [NLIMBS, 8, 128] — one full VPU tile per limb row — and the
entire ladder runs out of VMEM (~1 MB live state per block).

Equivalent of reference ecp_PointMultiply (source/curve25519_dh.c:94-157);
same fixed-iteration structure and branchless conditional swap as
models/montgomery.py.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from curve25519_tpu.config import A24, NLIMBS
from curve25519_tpu.ops import codec, fe
from curve25519_tpu.ops.pallas import fe_tile as ft

__all__ = ["ladder_tiled", "point_multiply_pallas"]

def _ladder_kernel(u_ref, k_ref, zr_ref, out_ref):
    """u_ref/k_ref: [1, 32, S, L] int32 BYTE rows (peer point encoding and
    the pre-clamped secret key). The byte->limb decode of u, the key-bit
    extraction, and the final canon + byte-encode all run in-kernel, so
    nothing but 32-byte strings crosses the kernel boundary in either
    direction (the same no-glue rule as the base-mult/poly-mult kernels —
    the [B, 20] limb codecs outside the launch were the last measured
    codec cost on the headline path, PERF.md §1)."""
    from curve25519_tpu.ops.pallas import sc_tile as sct
    rows = [u_ref[0, i] for i in range(32)]
    rows[31] = rows[31] & 0x7F               # RFC 7748: mask the top bit
    u = sct.limbs_from_byte_rows(jnp.stack(rows, axis=0))
    zr = zr_ref[0]
    pad = ft.t_pad()

    # initial state at key bit 254 (always set for clamped keys):
    # P = (u*zr : zr), Q = 2P  (cf. curve25519_dh.c:117-125)
    x3 = ft.t_mul(u, zr)
    z3 = zr
    a = ft.t_add(x3, z3)
    aa = ft.t_sqr(a)
    b = ft.t_sub(x3, z3, pad)
    bb = ft.t_sqr(b)
    x2 = ft.t_mul(aa, bb)
    e = ft.t_sub(aa, bb, pad)
    z2 = ft.t_mul(e, ft.t_mul_small_add(aa, A24, e))

    # Deferred conditional swap: keep the PHYSICAL step outputs
    # (A = doubled side, B = sum side) plus the bit that produced them, and
    # swap on entry only when the new bit differs (bit ^ prev) — 4 selects
    # per step instead of 8, same branchless semantics as the reference's
    # pointer-pair trick (curve25519_dh.c:86-89). After the virtual step for
    # bit 254 (always 1 for clamped keys): A = 2G', B = 1G', logical
    # lo = prev ? B : A. `prev` is read from k_ref (not a constant) so the
    # loop carry has a concrete, non-replicated Mosaic layout.
    prev = (k_ref[0, 254 // 8] >> (254 % 8)) & 1         # [S, L], == 1

    def step(t, st):
        ax, az, bx, bz, prev = st
        i = 253 - t
        # dynamic byte-row load from the ref (values don't support
        # dynamic_slice in Mosaic; refs do)
        byte = k_ref[0, i // 8]                  # [S, L]
        bit = (byte >> (i % 8)) & 1              # [S, L]
        s = bit ^ prev

        x2 = ft.t_select(s, bx, ax)
        x3 = ft.t_select(s, ax, bx)
        z2 = ft.t_select(s, bz, az)
        z3 = ft.t_select(s, az, bz)

        a = ft.t_add(x2, z2)
        aa = ft.t_sqr(a)
        b = ft.t_sub(x2, z2, pad)
        bb = ft.t_sqr(b)
        e = ft.t_sub(aa, bb, pad)
        c = ft.t_add(x3, z3)
        d = ft.t_sub(x3, z3, pad)
        da = ft.t_mul(d, a)
        cb = ft.t_mul(c, b)
        x3n = ft.t_sqr(ft.t_add(da, cb))
        z3n = ft.t_mul(u, ft.t_sqr(ft.t_sub(da, cb, pad)))
        x2n = ft.t_mul(aa, bb)
        z2n = ft.t_mul(e, ft.t_mul_small_add(aa, A24, e))
        return (x2n, z2n, x3n, z3n, bit)

    ax, az, bx, bz, prev = jax.lax.fori_loop(
        0, 254, step, (x2, z2, x3, z3, prev))
    lo_x = ft.t_select(prev, bx, ax)
    lo_z = ft.t_select(prev, bz, az)

    out_ref[0] = ft.t_to_bytes(ft.t_mul(lo_x, ft.t_inv(lo_z)))


@functools.partial(jax.jit, static_argnames=("interpret",))
def ladder_tiled(u_t, k_t, zr_t, interpret=False):
    """u_t, k_t: [G, 32, 8, 128] int32 tiled BYTE rows (u encoding; clamped
    secret); zr_t: [G, NLIMBS, 8, 128] limb tiles. Returns enc(u-coordinate)
    byte rows [G, 32, 8, 128] int32 (canon + pack in-kernel)."""
    g = u_t.shape[0]

    def spec(k):
        return pl.BlockSpec((1, k, ft.TILE_S, ft.TILE_L),
                            lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM)

    return pl.pallas_call(
        _ladder_kernel,
        grid=(g,),
        in_specs=[spec(32), spec(32), spec(NLIMBS)],
        out_specs=spec(32),
        out_shape=jax.ShapeDtypeStruct((g, 32, ft.TILE_S, ft.TILE_L),
                                       jnp.int32),
        interpret=interpret,
    )(u_t, k_t, zr_t)


_tile = ft.tile_lanes
_untile = ft.untile_lanes


def point_multiply_pallas(point_bytes, sk_bytes, zr=None, interpret=False):
    """Drop-in batched Q = k*P on 32-byte encodings via the Pallas kernel.

    Accepts any batch shape (including a single unbatched call): leading
    axes are flattened, the flat batch padded to a multiple of TILE_BATCH
    (1024), and the result unflattened. Semantics identical to
    models.montgomery.point_multiply."""
    from curve25519_tpu.ops.pallas import flatten_batch

    point_bytes = jnp.asarray(point_bytes, jnp.uint8)
    sk = codec.clamp(jnp.asarray(sk_bytes, jnp.uint8))
    batch = jnp.broadcast_shapes(point_bytes.shape[:-1], sk.shape[:-1])
    b, unflatten = flatten_batch(batch)
    point_bytes = jnp.broadcast_to(point_bytes, batch + (32,)).reshape(b, 32)
    sk = jnp.broadcast_to(sk, batch + (32,)).reshape(b, 32)

    bp = ((b + ft.TILE_BATCH - 1) // ft.TILE_BATCH) * ft.TILE_BATCH
    g = bp // ft.TILE_BATCH
    point_bytes = jnp.concatenate(
        [point_bytes, jnp.zeros((bp - b, 32), jnp.uint8)], 0)
    sk_p = jnp.concatenate([sk, jnp.zeros((bp - b, 32), jnp.uint8)], 0)
    sk_p = codec.clamp(sk_p)  # keep pad lanes well-formed (bit 254 set)

    if zr is None:
        zr_l = fe.one((bp,))
    else:
        zr_l = jnp.broadcast_to(zr, batch + (NLIMBS,)).reshape(b, NLIMBS)
        zr_l = jnp.concatenate(
            [zr_l, jnp.broadcast_to(fe.one(()), (bp - b, NLIMBS))], 0)
    out_t = ladder_tiled(_tile(point_bytes.astype(jnp.int32), g),
                         _tile(sk_p.astype(jnp.int32), g), _tile(zr_l, g),
                         interpret=interpret)
    return unflatten(_untile(out_t)[:b].astype(jnp.uint8))
