"""BabyBear^4 extension-field arithmetic on TPU Montgomery lanes.

Device twin of the hot pieces of :mod:`zigz_tpu.core.ext4`
(F_p[X]/(X^4 - 11)): an extension value-array is a ``uint32`` array of
shape ``(4,) + base_shape`` holding the four coordinates in Montgomery
form (ops/babybear lanes).  Only the operations the device zerocheck /
advice builders need are provided; scalar transcript algebra stays on the
host in :mod:`zigz_tpu.core.ext4`.

All functions are pure jnp and jittable; exactness is inherited from the
ops/babybear Montgomery contract, so results are bit-equal to the host
Ext4 (property-tested in tests/test_ext4_dev.py on the CPU backend).

Design note (not a port): the reference has no extension field at all
(hash.zig:228-242 squeezes base-field limbs); this module exists so the
round-3 soundness hardening (extension challenges everywhere) can run at
device speed instead of host numpy/C++.
"""

from __future__ import annotations

from functools import partial
from typing import List

import jax
import jax.numpy as jnp
import numpy as np

from .babybear import (
    P,
    add_mod,
    mont_mul,
    np_from_mont,
    np_to_mont,
    sub_mod,
    to_mont,
)

__all__ = [
    "W",
    "ext_to_device",
    "ext_from_device",
    "ext_scalar_to_device",
    "ext_add_dev",
    "ext_sub_dev",
    "ext_mul_dev",
    "ext_scale_dev",
    "ext_mul_base_dev",
    "ext_fold_dev",
    "ext_fold_base_dev",
    "ext_eq_table_dev",
    "ext_sum_dev",
    "ext_inv_dev",
]

W = 11  # X^4 = W (core/ext4.py)
_W_MONT = np.uint32(int(np_to_mont(np.array([W], dtype=np.uint64))[0]))
_SIGMA = pow(W, (P - 1) // 4, P)
# Frobenius coordinate scalings sigma^(k*i) in Montgomery form, k=1..3.
_FROB_MONT = [
    np.array(
        [int(np_to_mont(np.array([pow(_SIGMA, (k * i) % 4, P)], dtype=np.uint64))[0])
         for i in range(4)],
        dtype=np.uint32,
    )
    for k in range(4)
]


# -- host <-> device conversion ---------------------------------------------

def ext_to_device(x) -> jnp.ndarray:
    """Host Ext4 (canonical uint64 coords) -> (4, ...) mont uint32 device."""
    c = x.c if hasattr(x, "c") else np.asarray(x, dtype=np.uint64)
    return jnp.asarray(np_to_mont(np.ascontiguousarray(c, dtype=np.uint64)))


def ext_from_device(x4) -> np.ndarray:
    """(4, ...) mont uint32 -> canonical uint64 coords on host."""
    return np_from_mont(np.asarray(x4, dtype=np.uint64)).astype(np.uint64)


def ext_scalar_to_device(x) -> jnp.ndarray:
    """Host scalar Ext4 -> (4,) mont uint32."""
    return ext_to_device(x).reshape(4)


# -- ring ops ----------------------------------------------------------------

def ext_add_dev(a4, b4):
    return add_mod(a4, b4)


def ext_sub_dev(a4, b4):
    return sub_mod(a4, b4)


def _w_mul(x):
    return mont_mul(jnp.broadcast_to(jnp.uint32(_W_MONT), x.shape), x)


def _schoolbook(a, b):
    """Coordinate lists a[0..3], b[0..3] (broadcastable) -> 4 coords of the
    product mod X^4 - W.  16 mont muls + 3 W-muls."""
    m = [[mont_mul(a[i], b[j]) for j in range(4)] for i in range(4)]
    c0 = add_mod(m[0][0], _w_mul(add_mod(add_mod(m[1][3], m[2][2]), m[3][1])))
    c1 = add_mod(add_mod(m[0][1], m[1][0]), _w_mul(add_mod(m[2][3], m[3][2])))
    c2 = add_mod(add_mod(m[0][2], add_mod(m[1][1], m[2][0])), _w_mul(m[3][3]))
    c3 = add_mod(add_mod(m[0][3], m[1][2]), add_mod(m[2][1], m[3][0]))
    return [c0, c1, c2, c3]


def ext_mul_dev(a4, b4):
    """(4, ...) x (4, ...) elementwise extension product."""
    a = [a4[e] for e in range(4)]
    b = [b4[e] for e in range(4)]
    return jnp.stack(_schoolbook(a, b))


def ext_scale_dev(t4, s4):
    """Extension table (4, n) scaled by an extension scalar (4,)."""
    t = [t4[e] for e in range(4)]
    s = [jnp.broadcast_to(s4[e], t4.shape[1:]) for e in range(4)]
    return jnp.stack(_schoolbook(s, t))


def ext_mul_base_dev(a4, b):
    """(4, ...) extension times a base-field array (mont)."""
    return jnp.stack([mont_mul(a4[e], b) for e in range(4)])


def ext_fold_dev(t4, r4):
    """MSB fold of an extension table (4, n) by an extension scalar r:
    (1-r) * lo + r * hi."""
    one_m = jnp.uint32(int(np_to_mont(np.array([1], dtype=np.uint64))[0]))
    om = sub_mod(
        jnp.stack([one_m, jnp.uint32(0), jnp.uint32(0), jnp.uint32(0)]), r4
    )
    half = t4.shape[-1] // 2
    return ext_add_dev(ext_scale_dev(t4[..., :half], om),
                       ext_scale_dev(t4[..., half:], r4))


def ext_fold_base_dev(t, r4):
    """MSB fold of a BASE table (n,) by an extension scalar r -> (4, n/2):
    coordinate e = (1-r)_e * lo + r_e * hi."""
    one_m = jnp.uint32(int(np_to_mont(np.array([1], dtype=np.uint64))[0]))
    om = sub_mod(
        jnp.stack([one_m, jnp.uint32(0), jnp.uint32(0), jnp.uint32(0)]), r4
    )
    half = t.shape[-1] // 2
    lo, hi = t[..., :half], t[..., half:]
    return jnp.stack([
        add_mod(mont_mul(jnp.broadcast_to(om[e], lo.shape), lo),
                mont_mul(jnp.broadcast_to(r4[e], hi.shape), hi))
        for e in range(4)
    ])


def ext_eq_table_dev(taus_dev: List[jnp.ndarray], n: int):
    """Dense eq(tau, .) extension table (4, n), MSB-first variable order —
    device twin of proofs.zerocheck._eq_table_ext."""
    table = jnp.zeros((4, 1), jnp.uint32)
    one_m = jnp.uint32(int(np_to_mont(np.array([1], dtype=np.uint64))[0]))
    table = table.at[0, 0].set(one_m)
    one4 = jnp.stack([one_m, jnp.uint32(0), jnp.uint32(0), jnp.uint32(0)])
    for t4 in reversed(taus_dev):
        om = sub_mod(one4, t4)
        table = jnp.concatenate(
            [ext_scale_dev(table, om), ext_scale_dev(table, t4)], axis=-1
        )
    assert table.shape == (4, n)
    return table


def ext_sum_dev(t4, axis=-1):
    """Exact modular coordinate-wise sum (pairwise halving)."""
    from .mle import sum_mod

    return sum_mod(t4, axis=axis)


def ext_inv_dev(a4):
    """Batched extension inverse via Frobenius/norm (core/ext4.Ext4.inv
    twin): b = phi(a) phi^2(a) phi^3(a), N = (a*b)_0 base, a^-1 = b / N.
    Maps 0 to 0 (Fermat base inverse does).  Input/output mont (4, n)."""
    from .babybear import mont_pow

    def frob(k):
        return jnp.stack([
            mont_mul(jnp.broadcast_to(jnp.uint32(int(_FROB_MONT[k][e])),
                                      a4.shape[1:]), a4[e])
            for e in range(4)
        ])

    f1, f2, f3 = frob(1), frob(2), frob(3)
    b = ext_mul_dev(ext_mul_dev(f1, f2), f3)
    # N(a) = (a * b)_0: only coordinate 0 of the product is needed.
    n0 = add_mod(
        mont_mul(a4[0], b[0]),
        _w_mul(add_mod(add_mod(mont_mul(a4[1], b[3]), mont_mul(a4[2], b[2])),
                       mont_mul(a4[3], b[1]))),
    )
    n_inv = mont_pow(n0, P - 2)
    return jnp.stack([mont_mul(b[e], n_inv) for e in range(4)])
