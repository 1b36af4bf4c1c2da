from curve25519_tpu.models import montgomery, x25519  # noqa: F401
