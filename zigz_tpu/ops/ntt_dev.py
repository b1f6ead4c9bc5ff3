"""Device NTT: Reed-Solomon row encoding for Ligero commitments on TPU.

The Ligero PCS (commitments/ligero.py) encodes every row of the committed
matrix by evaluating its coefficient vector over the 2-adic subgroup of
size ``inv_rate * n``.  The host path is a threaded C++ encoder
(runtime/ntt.cpp); this module provides the TPU twin for matrices that
already live on device (e.g. the v4 witness built by ops/witness_dev.py),
where encoding on device avoids shipping hundreds of MB through the
host<->device link.

Layout is the whole design: a naive radix-2 sweep on a (R, n_out) array
puts early-stage butterflies on a trailing axis of length 2/4/8 — each
such stage pads to 128 lanes and wastes up to 64x the HBM traffic.
Instead rows are encoded with the four-step (Bailey) decomposition
N = N1*N2:

    A[j1, j2] = x[j1*N2 + j2]                       (reshape)
    B         = NTT_N1 over axis j1                  (k1 <- j1)
    C[k1, j2] = B[k1, j2] * w_N^(k1*j2)              (cross twiddles)
    D         = NTT_N2 over axis j2 of C^T           (k2 <- j2)
    X[k1 + N1*k2] = D[k2, k1]                        (already flat)

Both sub-NTTs run their butterflies on a LEADING axis (the other factor
rides the 128-lane dimension), so every stage is a full-width vector op.

Exactness: the host encoder works on canonical uint64 values; the device
path converts to Montgomery form once, applies the same twiddle values
(same subgroup generator, bit-reversed-input DIT), and converts back —
every intermediate is the same residue mod p, so the canonical outputs
are bit-identical (tests/test_ntt_dev.py).

Rows are processed in slabs so the transient (rows, n_out) Montgomery
matrix stays within a fixed HBM budget.
"""

from __future__ import annotations

from functools import partial
from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .babybear import P, add_mod, from_mont, mont_mul, np_to_mont, sub_mod, to_mont

__all__ = ["encode_rows_device"]

# Transient Montgomery-matrix budget per slab (elements, uint32).
_SLAB_ELEMS = 1 << 28  # 1 GiB

_DEV_CACHE: Dict[int, tuple] = {}


def _w_powers(n_out: int) -> np.ndarray:
    """[w^0, w^1, ..., w^(n_out-1)] mod p by doubling concatenation."""
    from ..commitments.ligero import _root_of_unity

    w = _root_of_unity(n_out)
    pows = np.ones(1, dtype=np.uint64)
    step = w
    while len(pows) < n_out:
        pows = np.concatenate([pows, pows * np.uint64(step) % np.uint64(P)])
        step = step * step % P
    return pows[:n_out]


def _stage_tables(n_out: int):
    """Four-step tables for size n_out, device resident, cached:
    (N1, N2, per-stage twiddles + bit-reverse for each factor, cross
    twiddle matrix w^(k1*j2) in Montgomery form)."""
    if n_out not in _DEV_CACHE:
        from ..commitments.ligero import _bit_reverse_indices, _twiddles

        v = n_out.bit_length() - 1
        v1 = v // 2
        n1, n2 = 1 << v1, 1 << (v - v1)
        tw1 = [jnp.asarray(np_to_mont(t).astype(np.uint32)) for t in _twiddles(n1)]
        tw2 = [jnp.asarray(np_to_mont(t).astype(np.uint32)) for t in _twiddles(n2)]
        br1 = jnp.asarray(_bit_reverse_indices(n1).astype(np.int32))
        br2 = jnp.asarray(_bit_reverse_indices(n2).astype(np.int32))
        pows = _w_powers(n_out)
        exps = np.outer(np.arange(n1, dtype=np.uint64),
                        np.arange(n2, dtype=np.uint64)) % np.uint64(n_out)
        cross = jnp.asarray(np_to_mont(pows[exps]).astype(np.uint32))
        _DEV_CACHE[n_out] = (n1, n2, tuple(tw1), tuple(tw2), br1, br2, cross)
    return _DEV_CACHE[n_out]


def _ntt_leading(x, tws, br):
    """Bit-reversed-input DIT NTT over axis 1 of (R, A, B) Montgomery
    lanes; the B axis stays trailing through every stage."""
    rows, a, b = x.shape
    x = jnp.take(x, br, axis=1)
    for tw in tws:
        half = tw.shape[0]
        length = 2 * half
        x = x.reshape(rows, a // length, length, b)
        lo = x[:, :, :half]
        hi = mont_mul(x[:, :, half:], tw[None, None, :, None])
        x = jnp.concatenate(
            [add_mod(lo, hi), sub_mod(lo, hi)], axis=2
        ).reshape(rows, a, b)
    return x


@partial(jax.jit, static_argnames=("n_out",))
def _encode_jit(mat32, n_out, tws1, tws2, br1, br2, cross):
    """(R, n) canonical uint32 -> (R, n_out) canonical uint32."""
    rows = mat32.shape[0]
    x = to_mont(mat32)
    pad = n_out - x.shape[-1]
    if pad:
        x = jnp.pad(x, ((0, 0), (0, pad)))
    n1, n2 = cross.shape
    x = x.reshape(rows, n1, n2)
    x = _ntt_leading(x, tws1, br1)            # (R, k1, j2)
    x = mont_mul(x, cross[None])              # cross twiddles
    x = x.transpose(0, 2, 1)                  # (R, j2, k1)
    x = _ntt_leading(x, tws2, br2)            # (R, k2, k1)
    return from_mont(x.reshape(rows, n_out))  # X[k1 + n1*k2] row-major


def encode_rows_device(mat, n_out: int) -> jnp.ndarray:
    """Encode each row's coefficients over the size-n_out subgroup on
    device; returns a device (R, n_out) canonical uint32 array.

    ``mat`` is (R, n) canonical values (any unsigned dtype, n <= n_out a
    power of two); accepts a device array as well (no re-transfer).
    Sizes below 256 fall back to the host encoder (they are latency-, not
    bandwidth-bound, and keep the device path's shapes well-tiled).
    """
    assert n_out & (n_out - 1) == 0
    if n_out < 256:
        from ..commitments.ligero import _ntt_pow2_numpy

        host = np.asarray(mat, dtype=np.uint64)
        return jnp.asarray(_ntt_pow2_numpy(host, n_out).astype(np.uint32))
    n1, n2, tws1, tws2, br1, br2, cross = _stage_tables(n_out)
    if isinstance(mat, np.ndarray):
        mat32 = jnp.asarray(mat.astype(np.uint32))
    else:
        mat32 = mat.astype(jnp.uint32)
    rows = mat32.shape[0]
    slab = max(1, _SLAB_ELEMS // n_out)
    if rows <= slab:
        return _encode_jit(mat32, n_out, tws1, tws2, br1, br2, cross)
    pieces = [
        _encode_jit(mat32[s : s + slab], n_out, tws1, tws2, br1, br2, cross)
        for s in range(0, rows, slab)
    ]
    return jnp.concatenate(pieces, axis=0)
