"""Zerocheck: prove a constraint combination vanishes on the hypercube.

This is the v2 "complete implementation" the reference's own comments
sketch (prover.zig:281-286): instead of all-zero placeholder round
polynomials, run a REAL sumcheck over

    Z(x) = eq(tau, x) * C(x),        C(x) = sum_j alpha_j * constraint_j(x)

where tau and the alpha_j are Fiat-Shamir challenges.  sum_x Z(x) = 0 iff
C vanishes everywhere on {0,1}^v (w.h.p. over tau) — the standard
eq-polynomial zerocheck.  Round polynomials have degree <= DEGREE (the
maximal constraint degree + 1 for the eq factor) and are sent as DEGREE+1
evaluations g(0..DEGREE); the verifier folds claims through barycentric
interpolation and finishes with an algebraic check: it computes
eq(tau, r) itself (closed form) and combines the prover's claimed terminal
evaluations of each constraint column.

The fold convention is MSB-first (reference partialEval ordering), matching
the wire-compatible sumcheck; the terminal per-column evaluations are
therefore at the fold-ordered point (bit v-1 <- r_1, ..., bit 0 <- r_v).

Hot path: all tables are canonical uint64 numpy rows; every operation is a
vectorized fold/product with mod-p reductions after each multiply.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Dict, List

import numpy as np

from ..core.hash import FiatShamirTranscript

__all__ = [
    "ZerocheckProof",
    "ZerocheckProver",
    "ZerocheckVerifier",
    "eq_eval",
    "make_zerocheck_prover",
]


def _fold_msb(table: np.ndarray, r: int, p: int) -> np.ndarray:
    half = table.shape[-1] // 2
    om = (1 - r) % p
    return (np.uint64(om) * table[..., :half] + np.uint64(r) * table[..., half:]) % np.uint64(p)


def _eval_at_t(table: np.ndarray, t: int, p: int) -> np.ndarray:
    """Table restricted to current-var = t (static small t)."""
    half = table.shape[-1] // 2
    if t == 0:
        return table[..., :half]
    if t == 1:
        return table[..., half:]
    # (1-t)*e0 + t*e1 mod p with t small.
    om = (1 - t) % p
    return (np.uint64(om) * table[..., :half] + np.uint64(t) * table[..., half:]) % np.uint64(p)


def eq_eval(taus: List[int], rs: List[int], p: int) -> int:
    """eq(tau, r) = prod_j ((1-tau_j)(1-r_j) + tau_j r_j) mod p."""
    acc = 1
    for t, r in zip(taus, rs):
        term = ((1 - t) % p) * ((1 - r) % p) % p
        term = (term + t * r) % p
        acc = acc * term % p
    return acc


def _eq_table(taus: List[int], p: int) -> np.ndarray:
    """Dense eq(tau, .) over the hypercube, MSB-first variable order: the
    j-th fold variable (tau_j) controls index bit v-j."""
    table = np.array([1], dtype=np.uint64)
    # Each concat step adds a new MOST-significant bit, so process taus in
    # reverse: the last appended (tau_1) lands on the MSB — matching the
    # MSB-first fold that consumes r_1 first.
    for t in reversed(taus):
        om = np.uint64((1 - t) % p)
        tv = np.uint64(t % p)
        table = np.concatenate([om * table % np.uint64(p), tv * table % np.uint64(p)])
    return table


@dataclass
class ZerocheckProof:
    num_vars: int
    degree: int
    round_evals: List[List[int]]  # per round: g(0..degree)
    final_point: List[int]  # challenges r_1..r_v
    column_evals: Dict[str, int]  # terminal evaluation per named column


class ZerocheckProver:
    """Generic zerocheck prover over named constraint columns.

    ``combiner(cols, alphas, p)`` evaluates C pointwise from a dict of
    equally-shaped numpy arrays (vectorized); DEGREE bounds deg(eq*C) per
    variable.
    """

    def __init__(self, F, columns: Dict[str, np.ndarray], combiner: Callable, degree: int,
                 num_alphas: int = None):
        self.F = F
        self.columns = columns
        self.combiner = combiner
        self.degree = degree
        # One combination challenge per CONSTRAINT (not per column).
        self.num_alphas = num_alphas if num_alphas is not None else len(columns)

    # Chunk width for combiner evaluation: sliced inputs keep every
    # intermediate term L2-resident instead of streaming dozens of
    # full-width temporaries through memory (the combiners are pure
    # elementwise expressions, so chunking is exact).
    COMBINE_CHUNK = 1 << 16

    def _combined_sum(self, at: Dict[str, np.ndarray], alphas, p: int) -> int:
        P64 = np.uint64(p)
        n = at["__eq__"].shape[-1]
        if n <= self.COMBINE_CHUNK:
            c_vals = self.combiner(at, alphas, p)
            # z < p < 2^31: u64 sum exact for any n <= 2^33.
            return int((at["__eq__"] * c_vals % P64).sum(dtype=np.uint64)) % p
        total = 0
        for lo in range(0, n, self.COMBINE_CHUNK):
            sl = {name: a[..., lo : lo + self.COMBINE_CHUNK] for name, a in at.items()}
            c_vals = self.combiner(sl, alphas, p)
            total += int((sl["__eq__"] * c_vals % P64).sum(dtype=np.uint64))
        return total % p

    def prove(self, transcript: FiatShamirTranscript) -> ZerocheckProof:
        F = self.F
        p = F.MODULUS
        # Precondition for the exact-uint64 arithmetic below: canonical
        # values < p < 2^31 keep every product < 2^62 and every hypercube
        # sum (n <= 2^33 terms) inside uint64.
        assert p < (1 << 31), "zerocheck requires a field modulus < 2^31"
        any_col = next(iter(self.columns.values()))
        n = any_col.shape[-1]
        num_vars = n.bit_length() - 1

        # Challenges: tau (zerocheck randomizer) then alphas (combination).
        taus = [transcript.challenge_value(p) for _ in range(num_vars)]
        alphas = [transcript.challenge_value(p) for _ in range(self.num_alphas)]

        tables = {name: col.astype(np.uint64) % np.uint64(p) for name, col in self.columns.items()}
        tables["__eq__"] = _eq_table(taus, p)

        round_evals: List[List[int]] = []
        rs: List[int] = []
        P64 = np.uint64(p)
        claim = 0  # zerocheck total; updated to g(r) after each round
        for _ in range(num_vars):
            # g(0) from the lo-half slices; g(1) DERIVED from the sumcheck
            # identity g(0) + g(1) = claim (skips one full combiner sweep
            # per round); g(2..d) built incrementally from per-column
            # deltas: at_t = at_{t-1} + (hi - lo)  == (1-t)*lo + t*hi mod p.
            # All identical values to the direct evaluation, so the
            # transcript and proof bytes are unchanged.
            at0 = {name: _eval_at_t(tab, 0, p) for name, tab in tables.items()}
            g0 = self._combined_sum(at0, alphas, p)
            evals_this_round = [g0, (claim - g0) % p]
            if self.degree >= 2:
                deltas = {
                    name: (tab[..., tab.shape[-1] // 2 :] + P64
                           - tab[..., : tab.shape[-1] // 2]) % P64
                    for name, tab in tables.items()
                }
                cur = {name: _eval_at_t(tab, 1, p).copy() for name, tab in tables.items()}
                for _t in range(2, self.degree + 1):
                    for name in cur:
                        cur[name] = (cur[name] + deltas[name]) % P64
                    evals_this_round.append(self._combined_sum(cur, alphas, p))
            round_evals.append(evals_this_round)

            for g in evals_this_round:
                transcript.append_u64(g)
            r = transcript.challenge_value(p)
            rs.append(r)
            claim = _interp_eval(evals_this_round, r, p)
            tables = {name: _fold_msb(tab, r, p) for name, tab in tables.items()}

        # "__"-prefixed tables (eq, and the public idx/selector MLEs of the
        # PC-chain argument) are verifier-computable: no terminal evals are
        # emitted or absorbed for them.
        column_evals = {
            name: int(tab[0]) for name, tab in tables.items()
            if not name.startswith("__")
        }
        for name in sorted(column_evals):
            transcript.append_u64(column_evals[name])

        return ZerocheckProof(
            num_vars=num_vars,
            degree=self.degree,
            round_evals=round_evals,
            final_point=rs,
            column_evals=column_evals,
        )


def make_zerocheck_prover(F, columns: Dict[str, np.ndarray], combiner: Callable,
                          degree: int, num_alphas: int = None, mesh=None):
    """Dispatch to the fastest available zerocheck backend: the generic
    DEVICE prover (ops/zerocheck_gen.py) when a fast-link TPU can win,
    else the threaded NATIVE C++ prover (ops/zerocheck_native.py), else
    the host numpy prover.  All three produce identical transcript bytes
    and proofs (tests/test_zerocheck_gen.py, test_zerocheck_native.py),
    so call sites treat the choice as an implementation detail.

    ZIGZ_TPU_ZEROCHECK forces a backend: "device" | "native" | "host"
    (pure numpy); "auto" is the default described above.  Device requires
    BabyBear, a traceable combiner (pure mod-p ring algebra — every
    combiner in the package qualifies), and width >= MIN_DEVICE_WIDTH."""
    from ..ops.zerocheck_gen import (
        MIN_AUTO_BW_MBPS,
        MIN_DEVICE_WIDTH,
        GenericDeviceZerocheck,
        device_transfer_mbps,
        zerocheck_device_pref,
    )

    pref = zerocheck_device_pref()
    n = next(iter(columns.values())).shape[-1]
    use_dev = (
        pref != "host"
        and F.MODULUS == 2013265921
        and n >= 2
        and (pref == "device" or n >= MIN_DEVICE_WIDTH)
    )
    if use_dev and pref != "device":
        # Auto mode: the columns live on host, so the device path only wins
        # on a TPU backend whose host->device link is fast (co-located chip,
        # not a tunneled remote device — see ops/zerocheck_gen.py).
        try:
            import jax

            use_dev = (jax.default_backend() == "tpu"
                       and device_transfer_mbps() >= MIN_AUTO_BW_MBPS)
        except Exception:
            use_dev = False
    if use_dev:
        try:
            return GenericDeviceZerocheck(
                F, columns, combiner, degree, num_alphas=num_alphas, mesh=mesh
            )
        except Exception:
            if pref == "device":
                raise
    if pref in ("auto", "native") and F.MODULUS == 2013265921 and n >= 2:
        from ..ops.zerocheck_native import NativeZerocheckProver, native_available

        if native_available():
            try:
                return NativeZerocheckProver(
                    F, columns, combiner, degree, num_alphas=num_alphas
                )
            except Exception:
                if pref == "native":
                    raise
        elif pref == "native":
            raise RuntimeError("ZIGZ_TPU_ZEROCHECK=native but dag.cpp runtime unavailable")
    return ZerocheckProver(F, columns, combiner, degree, num_alphas=num_alphas)


def _interp_eval(ys: List[int], x: int, p: int) -> int:
    """Evaluate the degree-d polynomial through (0..d, ys) at x (Lagrange)."""
    d = len(ys) - 1
    acc = 0
    for i in range(d + 1):
        num, den = 1, 1
        for j in range(d + 1):
            if i == j:
                continue
            num = num * ((x - j) % p) % p
            den = den * ((i - j) % p) % p
        acc = (acc + ys[i] * num % p * pow(den, -1, p)) % p
    return acc


class ZerocheckVerifier:
    """Round-consistency + terminal algebraic check."""

    def __init__(self, F, combiner_scalar: Callable, num_columns: int, degree: int):
        self.F = F
        self.combiner_scalar = combiner_scalar  # (col_evals: dict, alphas, p) -> int
        self.num_columns = num_columns
        self.degree = degree

    def verify(self, proof: ZerocheckProof, transcript: FiatShamirTranscript) -> bool:
        p = self.F.MODULUS
        # Shape checks BEFORE the round loop: a proof with zero rounds and
        # empty final_point would otherwise pass vacuously (eq over an
        # empty challenge list is 1 and the claim stays 0).
        if len(proof.round_evals) != proof.num_vars:
            return False
        if len(proof.final_point) != proof.num_vars:
            return False
        taus = [transcript.challenge_value(p) for _ in range(proof.num_vars)]
        alphas = [transcript.challenge_value(p) for _ in range(self.num_columns)]

        claim = 0  # zerocheck: total must be zero
        rs: List[int] = []
        for evals in proof.round_evals:
            if len(evals) != self.degree + 1:
                return False
            if (evals[0] + evals[1]) % p != claim:
                return False
            for g in evals:
                transcript.append_u64(g % p)
            r = transcript.challenge_value(p)
            rs.append(r)
            claim = _interp_eval(evals, r, p)

        if rs != proof.final_point:
            return False

        for name in sorted(proof.column_evals):
            transcript.append_u64(proof.column_evals[name] % p)

        eq_r = eq_eval(taus, rs, p)
        c_final = self.combiner_scalar(proof.column_evals, alphas, p)
        return (eq_r * c_final) % p == claim
