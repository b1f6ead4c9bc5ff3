"""BabyBear field arithmetic as 32-bit TPU lanes (JAX/XLA).

This is the device twin of zigz_tpu.core.field for p = 2^31 - 2^27 + 1.
Everything is pure ``uint32`` vector arithmetic — no 64-bit integers, so it
maps directly onto the TPU VPU (8x128 lanes) without int64 emulation:

* products are assembled from 16-bit limb multiplies (each partial product
  fits uint32);
* multiplication uses Montgomery REDC with R = 2^32: arrays are kept in
  Montgomery form across kernel compositions and converted at the host
  boundary (transcripts absorb canonical values only);
* addition/subtraction operate on either form (both are linear).

Correctness contract: for all a, b in [0, p),
``from_mont(mont_mul(to_mont(a), to_mont(b))) == a*b % p`` — property-tested
against the exact host field in tests/test_ops_babybear.py, on both the CPU
and TPU backends.

Design note (not a port): the reference does scalar ``(a*b) % p`` in u64
(field.zig:114-141); this module replaces that with Montgomery lanes as
mandated by the north star (BASELINE.json).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "P",
    "R_MOD_P",
    "R2_MOD_P",
    "NPRIME",
    "to_mont",
    "from_mont",
    "add_mod",
    "sub_mod",
    "neg_mod",
    "mont_mul",
    "mont_one",
    "mont_pow",
    "mont_inv",
    "np_to_mont",
    "np_from_mont",
]

P = 2013265921  # BabyBear: 2^31 - 2^27 + 1
_R = 1 << 32
R_MOD_P = _R % P  # Montgomery form of 1
R2_MOD_P = (_R * _R) % P  # for to_mont
# NPRIME = -p^{-1} mod 2^32  (so that (T + m*p) ≡ 0 mod R with m = T*NPRIME mod R)
NPRIME = (-pow(P, -1, _R)) % _R

_P32 = jnp.uint32(P)
_NPRIME32 = jnp.uint32(NPRIME)
_MASK16 = jnp.uint32(0xFFFF)


def _mul_lo_hi(a, b):
    """(low32, high32) of the 64-bit product of two uint32 arrays, computed
    entirely in uint32 via 16-bit limb decomposition."""
    a0 = a & _MASK16
    a1 = a >> 16
    b0 = b & _MASK16
    b1 = b >> 16
    m00 = a0 * b0
    m01 = a0 * b1
    m10 = a1 * b0
    m11 = a1 * b1
    # mid = m01 + m10 + (m00 >> 16): needs 33 bits in the worst general case,
    # but for inputs < 2^31 (ours) m01 + m10 < 2^32 - 2^17 so it fits.
    mid = m01 + m10 + (m00 >> 16)
    lo = (mid << 16) | (m00 & _MASK16)
    hi = m11 + (mid >> 16)
    return lo, hi


def _redc(lo, hi):
    """Montgomery reduction of T = hi*2^32 + lo (T < p*2^32) -> T*R^-1 mod p."""
    m = lo * _NPRIME32  # mod 2^32 automatically
    _, mp_hi = _mul_lo_hi(m, jnp.broadcast_to(_P32, m.shape))
    # (lo + low32(m*p)) is 0 or 2^32 exactly; carry = (lo != 0).
    carry = (lo != 0).astype(jnp.uint32)
    t = hi + mp_hi + carry
    return jnp.where(t >= _P32, t - _P32, t)


def mont_mul(a, b):
    """Montgomery product: REDC(a*b). Inputs/outputs in Montgomery form."""
    lo, hi = _mul_lo_hi(a, b)
    return _redc(lo, hi)


def add_mod(a, b):
    s = a + b  # both < p < 2^31, no wraparound
    return jnp.where(s >= _P32, s - _P32, s)


def sub_mod(a, b):
    return jnp.where(a >= b, a - b, a + _P32 - b)


def neg_mod(a):
    return jnp.where(a == 0, a, _P32 - a)


def to_mont(x):
    """Canonical -> Montgomery: REDC(x * R^2)."""
    lo, hi = _mul_lo_hi(x.astype(jnp.uint32), jnp.broadcast_to(jnp.uint32(R2_MOD_P), jnp.shape(x)))
    return _redc(lo, hi)


def from_mont(xm):
    """Montgomery -> canonical: REDC(x)."""
    return _redc(xm, jnp.zeros_like(xm))


def mont_one(shape=()):
    return jnp.full(shape, jnp.uint32(R_MOD_P), dtype=jnp.uint32)


@partial(jax.jit, static_argnames=("exp",))
def mont_pow(am, exp: int):
    """Square-and-multiply with a static exponent (unrolled by the tracer)."""
    result = jnp.broadcast_to(jnp.uint32(R_MOD_P), am.shape)
    base = am
    e = exp
    while e > 0:
        if e & 1:
            result = mont_mul(result, base)
        base = mont_mul(base, base)
        e >>= 1
    return result


def mont_inv(am):
    """Batched Fermat inverse: a^(p-2). Zero maps to zero (caller beware)."""
    return mont_pow(am, P - 2)


# ---------------------------------------------------------------------------
# numpy twins (exact, uint64-based) for golden tests and host-side prep.
# ---------------------------------------------------------------------------

def np_to_mont(x: np.ndarray) -> np.ndarray:
    return ((x.astype(np.uint64) * np.uint64(R_MOD_P)) % np.uint64(P)).astype(np.uint32)


def np_from_mont(xm: np.ndarray) -> np.ndarray:
    rinv = pow(_R, -1, P)
    return ((xm.astype(np.uint64) * np.uint64(rinv)) % np.uint64(P)).astype(np.uint32)
