"""Multilinear-extension kernels: fold / round-sum / batched eval.

The device workhorse (SURVEY.md §7 step 3).  All arrays are BabyBear values
in Montgomery form (uint32); all reductions are exact pairwise modular adds
(no wide accumulators, so everything stays in native 32-bit VPU lanes).

Two fold orderings exist in the reference and both are provided:

* ``fold_lsb`` — pairs adjacent elements (new[i] = (1-r)e[2i] + r·e[2i+1]).
  This is the ordering of ``Multilinear.eval``'s chi products
  (multilinear.zig:110-144) AND the shard-friendly ordering: under a
  trace-axis sharding adjacent pairs are always shard-local, so v - log2(D)
  rounds run without any communication (see zigz_tpu/parallel).
* ``fold_msb`` — splits at half (new[i] = (1-r)e[i] + r·e[i+half]), the
  reference's ``partialEval`` (multilinear.zig:154-180), used by the
  wire-compatible sumcheck prover.

``batch_eval_lsb`` evaluates 43 witness MLEs at 43 *different* points in one
fused jit program — the pipeline's hot "openings" phase (prover.zig:420-427).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .babybear import (
    P,
    R_MOD_P,
    add_mod,
    from_mont,
    mont_mul,
    np_to_mont,
    sub_mod,
    to_mont,
)

__all__ = [
    "fold_lsb",
    "fold_msb",
    "sum_mod",
    "round_poly_msb",
    "batch_eval_lsb",
    "eval_backend",
]


def fold_lsb(evals_m, r_m):
    """One LSB fold: (..., N) -> (..., N/2); r_m broadcasts over leading dims."""
    shape = evals_m.shape
    pairs = evals_m.reshape(shape[:-1] + (shape[-1] // 2, 2))
    e0 = pairs[..., 0]
    e1 = pairs[..., 1]
    one_minus_r = sub_mod(jnp.broadcast_to(jnp.uint32(R_MOD_P), r_m.shape), r_m)
    return add_mod(mont_mul(one_minus_r, e0), mont_mul(r_m, e1))


def fold_msb(evals_m, r_m):
    """Reference partialEval ordering: split at half."""
    half = evals_m.shape[-1] // 2
    e0 = evals_m[..., :half]
    e1 = evals_m[..., half:]
    one_minus_r = sub_mod(jnp.broadcast_to(jnp.uint32(R_MOD_P), r_m.shape), r_m)
    return add_mod(mont_mul(one_minus_r, e0), mont_mul(r_m, e1))


def sum_mod(evals, axis=-1):
    """Exact modular sum via pairwise halving (stays in uint32).

    Works on canonical or Montgomery values (addition is form-agnostic).
    Handles non-power-of-two lengths by peeling the odd element.
    """
    x = jnp.moveaxis(evals, axis, -1)
    while x.shape[-1] > 1:
        n = x.shape[-1]
        if n % 2 == 1:
            tail = x[..., -1]
            x = x[..., :-1]
        else:
            tail = None
        pairs = x.reshape(x.shape[:-1] + (x.shape[-1] // 2, 2))
        x = add_mod(pairs[..., 0], pairs[..., 1])
        if tail is not None:
            x = x.at[..., 0].set(add_mod(x[..., 0], tail))
    return x[..., 0]


def round_poly_msb(evals_m):
    """Sumcheck round sums with the half-split convention:
    returns (g0, g1) = (sum of first half, sum of second half)."""
    half = evals_m.shape[-1] // 2
    return sum_mod(evals_m[..., :half]), sum_mod(evals_m[..., half:])


@jax.jit
def _batch_eval_lsb_jit(matrix_m, points_m):
    """matrix_m: (B, 2^v) mont; points_m: (B, v) mont -> (B,) mont."""
    v = points_m.shape[1]
    cur = matrix_m
    for j in range(v):
        r = points_m[:, j][:, None]  # (B, 1) broadcasts over pairs
        cur = fold_lsb(cur, r)
    return cur[:, 0]


def batch_eval_lsb(matrix_m, points_m):
    if matrix_m.shape[-1] == 1:
        return matrix_m[:, 0]
    return _batch_eval_lsb_jit(matrix_m, points_m)


# ---------------------------------------------------------------------------
# Prover integration: canonical-u64 in/out evaluation backend.
# ---------------------------------------------------------------------------

def eval_backend(matrix: np.ndarray, points: np.ndarray) -> np.ndarray:
    """Evaluate B MLEs (canonical uint64 rows) at B points (canonical uint64
    rows, LSB-first ordering).  Returns canonical uint64 evals.

    This is the accelerated replacement for 43 sequential host
    ``Multilinear.eval`` calls in the commitment phase.
    """
    matrix_m = jnp.asarray(np_to_mont(matrix.astype(np.uint64)))
    if points.size == 0:
        return np.asarray(matrix[:, 0], dtype=np.uint64)
    points_m = jnp.asarray(np_to_mont(points.astype(np.uint64)))
    result_m = batch_eval_lsb(matrix_m, points_m)
    return np.asarray(from_mont(result_m), dtype=np.uint64)
