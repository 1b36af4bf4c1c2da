from curve25519_tpu.ops import fe  # noqa: F401
