"""Multi-chip sharding over the trace/hypercube axis.

The reference is single-threaded CPU (SURVEY.md §2.11); this module is the
new first-class component the north star mandates: shard the 2^v evaluation
axis of witness MLEs across chips via ``jax.sharding.Mesh`` + NamedSharding
and let XLA insert the collectives (psum for round sums, collective-permute
for the MSB fold's cross-shard pairing, gathers at the shrinking-axis tail).

Design notes (idiomatic pjit, not a port):

* We write GLOBAL-semantics jnp programs (fold + round sums from
  zigz_tpu.ops.mle) and jit them with sharded input layouts; the SPMD
  partitioner emits ICI collectives.  Control flow (the Fiat-Shamir
  transcript) stays on host and is replicated deterministically — only
  reductions cross the wire.
* The LSB fold keeps adjacent pairs shard-local for v - log2(D) rounds; the
  MSB fold (wire-compatible ordering) pairs shard d with shard d + D/2,
  which XLA lowers to a single collective-permute per round.
* Each sumcheck round needs one device->host sync for the challenge —
  inherent to Fiat-Shamir (SURVEY.md §7 hard part 5); everything else is
  batched around those syncs.
"""

from __future__ import annotations

from functools import lru_cache, partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core.hash import FiatShamirTranscript
from ..ops import babybear as bb
from ..ops.mle import fold_lsb, fold_msb, round_poly_msb, sum_mod

__all__ = [
    "make_trace_mesh",
    "shard_rows",
    "replicated",
    "DistSumcheckProver",
    "device_prove_step",
]


def make_trace_mesh(n_devices: Optional[int] = None, devices=None) -> Mesh:
    """1-D mesh over the hypercube ("trace") axis."""
    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            devices = devices[:n_devices]
    return Mesh(np.array(devices), ("trace",))


def shard_rows(mesh: Mesh, arr, axis: int = -1):
    """Place an array with its trailing (hypercube) axis sharded over the
    mesh; leading axes replicated."""
    ndim = jnp.ndim(arr)
    spec = [None] * ndim
    spec[axis if axis >= 0 else ndim + axis] = "trace"
    return jax.device_put(arr, NamedSharding(mesh, P(*spec)))


def replicated(mesh: Mesh, arr):
    return jax.device_put(arr, NamedSharding(mesh, P()))


@jax.jit
def _round_sums(evals_m):
    g0, g1 = round_poly_msb(evals_m)
    return g0, g1


@jax.jit
def _fold(evals_m, r_m):
    return fold_msb(evals_m, r_m)


class DistSumcheckProver:
    """Distributed wire-compatible sumcheck over a sharded MLE.

    Produces EXACTLY the same round polynomials / challenges / final values
    as the host ``SumcheckProver`` (same MSB-fold ordering, same per-proof
    fresh transcript — sumcheck_prover.zig:26-91), but with the 2^v axis on
    device and sharded.  Golden-tested against the host prover in
    tests/test_parallel.py.
    """

    def __init__(self, F, mesh: Optional[Mesh] = None):
        assert F.MODULUS == bb.P, "device sumcheck is BabyBear-only for now"
        self.F = F
        self.mesh = mesh

    def prove(self, evals_canonical: np.ndarray):
        from ..proofs.sumcheck import SumcheckProof

        F = self.F
        n = len(evals_canonical)
        num_vars = n.bit_length() - 1
        if n == 1 or (1 << num_vars) != n:
            raise ValueError("evals must be a power of two > 1")

        evals_m = jnp.asarray(bb.np_to_mont(np.asarray(evals_canonical, dtype=np.uint64)))
        if self.mesh is not None:
            evals_m = shard_rows(self.mesh, evals_m)

        transcript = FiatShamirTranscript()
        round_polys = []
        challenges = []
        cur = evals_m
        for _ in range(num_vars):
            g0m, g1m = _round_sums(cur)
            g0 = int(np.asarray(bb.from_mont(g0m[None]))[0])
            g1 = int(np.asarray(bb.from_mont(g1m[None]))[0])
            coeffs = [F.from_reduced(g0), F.from_reduced((g1 - g0) % F.MODULUS)]
            round_polys.append(coeffs)
            for c in coeffs:
                transcript.append_field_element(F, c)
            r = transcript.challenge(F)
            challenges.append(r)
            r_m = jnp.asarray(bb.np_to_mont(np.array([r.value], dtype=np.uint64)))
            cur = _fold(cur, r_m)

        final_eval = F.from_reduced(int(np.asarray(bb.from_mont(cur))[0]))
        return SumcheckProof(
            round_polynomials=round_polys,
            final_point=challenges,
            final_eval=final_eval,
            num_vars=num_vars,
        )


@jax.jit
def device_prove_step(matrix_m, points_m, r_m):
    """One fused device phase of the proving pipeline — the "training step"
    analogue used by the multi-chip dry run:

    * batched opening evaluation of all rows at per-row points (LSB folds,
      shard-local under a trace sharding);
    * one sumcheck round (half-split partial sums -> psum);
    * one fold (collective-permute under the trace sharding).

    Inputs: matrix_m (B, N) mont, points_m (B, v) mont, r_m (1,) mont.
    Returns: (evals (B,), g0 (B,), g1 (B,), folded (B, N/2)).
    """
    v = points_m.shape[1]
    cur = matrix_m
    for j in range(v):
        cur = fold_lsb(cur, points_m[:, j][:, None])
    evals = cur[:, 0]
    half = matrix_m.shape[-1] // 2
    g0 = sum_mod(matrix_m[:, :half])
    g1 = sum_mod(matrix_m[:, half:])
    folded = fold_msb(matrix_m, r_m)
    return evals, g0, g1, folded
