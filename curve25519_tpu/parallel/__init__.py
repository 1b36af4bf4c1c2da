from curve25519_tpu.parallel import mesh  # noqa: F401
