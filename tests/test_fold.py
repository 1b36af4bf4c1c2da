"""Fold-cut extraction and scalar codecs: the direct-from-encoding forms
(static gathers) must be bit-identical to the bit-tensor permutation forms
and to big-int models. Reference anchors: ecp_8Folds / ecp_4Folds
(source/curve25519_utils.c:125-153), eco_DigestToWords
(source/curve25519_order.c:138-155), ecp_WordsToBytes."""

import numpy as np
import jax.numpy as jnp

from curve25519_tpu.config import ELL, limbs_to_int
from curve25519_tpu.ops import codec, fe, fold, sc

rng = np.random.default_rng(77)


def test_cut_forms_agree():
    b = jnp.asarray(rng.integers(0, 256, (33, 32), dtype=np.uint8))
    bits = codec.scalar_bits(b)
    limbs = fe.from_bytes(b)
    assert np.array_equal(np.asarray(fold.cut8(bits)),
                          np.asarray(fold.cut8_bytes(b)))
    assert np.array_equal(np.asarray(fold.cut8(bits)),
                          np.asarray(fold.cut8_limbs(limbs)))
    assert np.array_equal(np.asarray(fold.cut4(bits)),
                          np.asarray(fold.cut4_bytes(b)))
    assert np.array_equal(np.asarray(fold.cut4(bits)),
                          np.asarray(fold.cut4_limbs(limbs)))


def test_cut8_matches_reference_convention():
    # cut[c] bit j == scalar bit 32j + 31 - c (the reference C semantics)
    b = rng.integers(0, 256, 32, dtype=np.uint8)
    k = int.from_bytes(b.tobytes(), "little")
    got = np.asarray(fold.cut8_bytes(jnp.asarray(b)))
    for c in range(0, 32, 7):
        want = sum(((k >> (32 * j + 31 - c)) & 1) << j for j in range(8))
        assert got[c] == want


def test_sc_to_bytes_from_digest_bigint():
    md = jnp.asarray(rng.integers(0, 256, (9, 64), dtype=np.uint8))
    s = sc.from_digest(md)
    got = np.asarray(s)
    by = np.asarray(sc.to_bytes(s))
    for i in range(9):
        v = int.from_bytes(bytes(np.asarray(md[i])), "little") % ELL
        assert limbs_to_int(got[i]) == v
        assert int.from_bytes(by[i].tobytes(), "little") == v


def test_fe_norm_to_bytes_matches_to_bytes():
    # for canonical inputs the raw gather equals the canonicalizing form
    b = jnp.asarray(rng.integers(0, 256, (9, 32), dtype=np.uint8))
    b = b.at[..., 31].set(b[..., 31] & 0x3F)      # < p, canonical
    x = fe.from_bytes(b)
    assert np.array_equal(np.asarray(fe.norm_to_bytes(x)),
                          np.asarray(fe.to_bytes(x)))
    assert np.array_equal(np.asarray(fe.norm_to_bytes(x)), np.asarray(b))
