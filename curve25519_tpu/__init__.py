"""curve25519_tpu — a TPU-native Curve25519/Ed25519 framework (JAX/XLA/Pallas).

Brand-new implementation with the capabilities of msotoodeh/curve25519:
X25519 DH, Ed25519 sign/verify, scalar arithmetic mod the group order,
SHA-512, FOLDING precomputation, and scalar blinding — rearchitected for TPU:
batched limb tensors, branch-free constant-time kernels, MXU one-hot table
gathers, and mesh-sharded throughput scaling.
"""

__version__ = "0.1.0"

from curve25519_tpu import config  # noqa: F401
