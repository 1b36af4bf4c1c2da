"""Precomputed folding tables and constant-time table gathers.

Re-creates the reference's 256-entry base-point FOLDING-8 table — all subset
sums of P_i = 2^(32*i) * G, i = 0..7, stored in precomputed-affine form
(Y+X, Y-X, 2d*T) — from first principles via the pure-Python model, exactly
as the reference selftest generator does (reference:
test/curve25519_selftest.c:498-551 emitting source/base_folding8.h).

The reference indexes this table with secret-derived bytes — a data-dependent
load it acknowledges as outside its constant-time claim (SURVEY.md §3.2).
Here the lookup is a one-hot int8 matmul on the MXU: limbs are split into two
7-bit planes so every product fits int8 exactly and the int32 accumulation is
exact — a constant-time gather by construction.
"""

import functools

import jax.numpy as jnp
import numpy as np

from curve25519_tpu.config import ED_2D, NLIMBS, P, int_to_limbs
from curve25519_tpu import refmodel

__all__ = [
    "folding8_table", "folding8_planes", "folding4_table", "gather_pa",
    "gather_pa4", "gather_pe", "pe_planes_from_array",
    "pe_planes_from_canonical",
]


@functools.lru_cache(maxsize=None)
def _folding_table(nfolds, ndoubles):
    """[2^nfolds, 3, NLIMBS] int32 folding table: all subset sums of
    P_i = 2^(ndoubles*i) * G, i = 0..nfolds-1, in (YpX, YmX, T2d) form.
    Shared generator for the folding-8 and folding-4 variants — a bound or
    invariant fix here applies to both."""
    points = []
    g = refmodel.BASE
    for i in range(nfolds):
        points.append(g)
        for _ in range(ndoubles):
            g = refmodel.ed_double(g)
    nent = 1 << nfolds
    out = np.zeros((nent, 3, NLIMBS), dtype=np.int32)
    for idx in range(nent):
        acc = refmodel.IDENTITY
        for i in range(nfolds):
            if (idx >> i) & 1:
                acc = refmodel.ed_add(acc, points[i])
        x, y = acc
        out[idx, 0] = int_to_limbs((y + x) % P)
        out[idx, 1] = int_to_limbs((y - x) % P)
        out[idx, 2] = int_to_limbs(ED_2D * x * y % P)
    return out


def folding8_table():
    """[256, 3, NLIMBS] int32: (YpX, YmX, T2d) per entry; entry 0 is the
    identity (1, 1, 0) (reference base_folding8.h:6)."""
    return _folding_table(8, 32)


def folding4_table():
    """[16, 3, NLIMBS] int32 FOLDING-4 base table: subset sums of
    P_i = 2^(64*i) * G, i = 0..3. The reference selftest generates the same
    table as base_folding4.h (reference: test/curve25519_selftest.c:455-497);
    a 4-fold base multiply trades the folding-8 table's 256 entries for 16
    at twice the loop length."""
    return _folding_table(4, 64)


@functools.lru_cache(maxsize=None)
def _folding4_planes():
    t = folding4_table()
    return _split_planes(t.reshape(16, 3 * NLIMBS))


def gather_pa4(cut):
    """cut: [...] int32 index in [0, 16) -> PA point dict from the folding4
    table (constant-time one-hot contraction)."""
    w = 3 * NLIMBS
    vals = _onehot_matmul(cut, _folding4_planes(), 16, w)
    vals = vals.reshape(vals.shape[:-1] + (3, NLIMBS))
    return {"ypx": vals[..., 0, :], "ymx": vals[..., 1, :],
            "t2d": vals[..., 2, :]}


def _split_planes(table_2d):
    """[N, K] int32 limbs (< 2^13) -> [N, 2K] int8: lo 7 bits ++ hi 6 bits."""
    lo = (table_2d & 0x7F).astype(np.int8)
    hi = (table_2d >> 7).astype(np.int8)
    return np.concatenate([lo, hi], axis=-1)


@functools.lru_cache(maxsize=None)
def folding8_planes():
    """[256, 6*NLIMBS] int8 plane-split table for the MXU gather."""
    t = folding8_table()
    return _split_planes(t.reshape(256, 3 * NLIMBS))


def _onehot_matmul(idx, planes, nent, width):
    """Constant-time gather: one-hot(idx) @ planes, recombined to int32.

    idx: [...] int32 in [0, nent); planes: [nent, 2*width] int8.
    Exact: one-hot entries and 7-bit limb planes both fit int8; the matmul
    accumulates in int32 on the MXU."""
    oh = (idx[..., None] == jnp.arange(nent, dtype=jnp.int32)).astype(jnp.int8)
    flat = jnp.dot(oh, jnp.asarray(planes), preferred_element_type=jnp.int32)
    lo, hi = flat[..., :width], flat[..., width:]
    return lo + (hi << 7)


def gather_pa(cut):
    """cut: [...] int32 index -> PA point dict of [..., NLIMBS] limb tensors
    from the folding8 table (constant-time)."""
    w = 3 * NLIMBS
    vals = _onehot_matmul(cut, folding8_planes(), 256, w)
    vals = vals.reshape(vals.shape[:-1] + (3, NLIMBS))
    return {"ypx": vals[..., 0, :], "ymx": vals[..., 1, :],
            "t2d": vals[..., 2, :]}


def pe_planes_from_array(pe_array):
    """Split a runtime-built PE table [..., N, 4, NLIMBS] into int8 planes
    [..., N, 8*NLIMBS] for constant-time gathering. Limbs are canonicalized
    first: the 7-bit plane split is exact only for values in [0, 2^14), and
    signed-weak limbs (ops/fe.py invariant) may be negative."""
    from curve25519_tpu.ops import fe
    return pe_planes_from_canonical(fe.canon(pe_array))


def pe_planes_from_canonical(pe_array):
    """Plane split for an ALREADY-CANONICAL PE table (e.g. the Pallas
    Verify_Init kernel canonicalizes in-kernel) — the cheap elementwise
    half of pe_planes_from_array, with no [.., NLIMBS] canon on the glue
    path."""
    n = pe_array.shape[-3]
    flat = pe_array.reshape(pe_array.shape[:-3] + (n, 4 * NLIMBS))
    lo = (flat & 0x7F).astype(jnp.int8)
    hi = (flat >> 7).astype(jnp.int8)
    return jnp.concatenate([lo, hi], axis=-1)


def gather_pe(idx, planes, nent=16):
    """idx: [...] int32; planes: [..., nent, 8*NLIMBS] int8 (leading axes are
    batch axes matching idx's, e.g. a per-key q_table). Returns a PE point
    dict. Uses a batched one-hot contraction (constant-time)."""
    w = 4 * NLIMBS
    oh = (idx[..., None] == jnp.arange(nent, dtype=jnp.int32)).astype(jnp.int8)
    # batched: [..., nent] x [..., nent, 2w] -> [..., 2w]
    flat = jnp.einsum("...n,...nk->...k", oh, planes,
                      preferred_element_type=jnp.int32)
    lo, hi = flat[..., :w], flat[..., w:]
    vals = (lo + (hi << 7)).reshape(idx.shape + (4, NLIMBS))
    return {"ypx": vals[..., 0, :], "ymx": vals[..., 1, :],
            "t2d": vals[..., 2, :], "z2": vals[..., 3, :]}
