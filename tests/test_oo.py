"""OO wrapper round-trips (reference C++ class layer equivalents)."""

from curve25519_tpu.oo import ED25519Private, ED25519Public, X25519Private


def test_x25519_oo_round_trip():
    alice, bob = X25519Private(b"A" * 32), X25519Private(b"B" * 32)
    s1 = alice.create_shared_key(bob.get_public_key())
    s2 = bob.create_shared_key(alice.get_public_key())
    assert s1 == s2 and len(s1) == 32
    # raw (no KDF) must differ from KDF'd output
    assert alice.create_shared_key(bob.get_public_key(), kdf=False) != s1


def test_ed25519_oo_sign_verify():
    signer = ED25519Private(b"S" * 32)
    pub = ED25519Public(signer.get_public_key())
    msg = b"the quick brown fox"
    sig = signer.sign(msg)
    assert pub.verify(sig, msg)
    assert not pub.verify(sig, msg + b"!")
    bad = bytes([sig[0] ^ 1]) + sig[1:]
    assert not pub.verify(bad, msg)
