"""Global configuration for the TPU-native curve25519 framework.

The reference library (msotoodeh/curve25519) switches between a portable
8x32-bit limb representation and a 4x64-bit x86-64 assembly representation via
the ``USE_ASM_LIB`` define (reference: source/curve25519_mehdi.h:36-46).

TPUs have no 64-bit integer multiplier, so neither radix maps to the hardware.
We instead pick a radix whose schoolbook products *provably* fit the TPU's
native 32-bit integer lanes:

    radix = 2**13, 20 limbs  (260 bits >= 255)

    - limb product: (2^13.1)^2  < 2^26.2
    - column sum of a 20x20 schoolbook multiply: 20 * 2^26.2 < 2^31  (int32-safe)
    - reduction fold uses 2^260 = 2^5 * 19 = 608 (mod p), the analogue of the
      reference's 2^256 = 38 (mod p) lazy-reduction trick
      (reference: source/curve25519_mehdi.c:278-330).

Field elements are int32 limb tensors of shape ``[..., NLIMBS]`` where the
leading axes are batch axes; every operation is vectorized over them and is
branch-free by construction (constant-time on TPU).

The "weak normalization" invariant maintained between ops:
    limbs[1:] < 2**13  and  limbs[0] <= 2**13 + 608
which keeps every column sum of a subsequent multiply below 2**31.
"""

import numpy as np

# ---------------------------------------------------------------------------
# Field modulus p = 2^255 - 19
# ---------------------------------------------------------------------------
P = 2**255 - 19

# Base point order l = 2^252 + 27742317777372353535851937790883648493
# (reference: source/curve25519_order.c:27-44)
ELL = 2**252 + 27742317777372353535851937790883648493

# Limb configuration
BITS = 13
NLIMBS = 20
MASK = (1 << BITS) - 1          # 0x1fff
TOTAL_BITS = BITS * NLIMBS      # 260

# 2^260 mod p = 2^5 * 19 (lazy reduction multiplier, analogue of "38")
FOLD = (1 << TOTAL_BITS) % P
assert FOLD == 608

# Montgomery curve constant (A - 2) / 4 used by the XZ ladder
# (reference: source/curve25519_dh.c:51-52)
A24 = 121665

# Edwards curve constant d = -121665/121666 mod p
# (reference: source/ed25519_sign.c:30-42)
ED_D = (-121665 * pow(121666, P - 2, P)) % P
ED_2D = (2 * ED_D) % P
ED_DI = pow(ED_D, P - 2, P)     # 1/d  (reference _w_di, source/ed25519_sign.c:61)
SQRT_M1 = pow(2, (P - 1) // 4, P)  # sqrt(-1) (reference _w_I, ed25519_verify.c:60)

# Ed25519 base point: y = 4/5 mod p, x = the even root
# (reference: source/ed25519_sign.c:36-38)
ED_BY = (4 * pow(5, P - 2, P)) % P
_x2 = ((ED_BY * ED_BY - 1) * pow(ED_D * ED_BY * ED_BY + 1, P - 2, P)) % P
_x = pow(_x2, (P + 3) // 8, P)
if (_x * _x - _x2) % P != 0:
    _x = (_x * SQRT_M1) % P
if _x % 2 != 0:
    _x = P - _x
ED_BX = _x
assert ED_BX == 0x216936D3CD6E53FEC0A4E231FDD6DC5C692CC7609525A7B2C9562D608F25D51A
assert ED_BY == 0x6666666666666666666666666666666666666666666666666666666666666658

# X25519 base point u-coordinate (reference: source/curve25519_dh.c:37-38)
MONT_BASE_U = 9


# ---------------------------------------------------------------------------
# Host-side integer <-> limb conversions (numpy, used for constants and tests)
# ---------------------------------------------------------------------------
def int_to_limbs(x: int, n: int = NLIMBS) -> np.ndarray:
    """Split a non-negative python int into n base-2^BITS limbs (int32)."""
    out = np.zeros(n, dtype=np.int32)
    for i in range(n):
        out[i] = x & MASK
        x >>= BITS
    if x != 0:
        raise ValueError("value does not fit in %d limbs" % n)
    return out


def limbs_to_int(limbs) -> int:
    """Reassemble a limb vector (any integer dtype, possibly unnormalized)."""
    limbs = np.asarray(limbs)
    return sum(int(v) << (BITS * i) for i, v in enumerate(limbs.tolist()))
