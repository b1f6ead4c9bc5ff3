"""Device zerocheck: the v2 constraint sumcheck's hot loop on TPU.

The host ZerocheckProver (proofs/zerocheck.py) sweeps every column
``degree+1`` times per round in numpy — at 2^20 steps that is the v2
protocol's dominant host cost.  This module runs the identical
computation in BabyBear Montgomery lanes (ops/babybear):

* the eq(tau, .) table is BUILT ON DEVICE from the v tau challenges
  (v mont-muls over 2^v lanes — no 2^v host->device transfer);
* each round evaluates g(0..degree) with one fused jit program
  (MSB-half folds + the v2 combiner + pairwise-exact modular sums);
* the per-round Fiat-Shamir challenge stays on host (consensus-critical,
  SURVEY.md §7 hard part 5); the fold is one more device call;
* below ``HOST_TAIL`` remaining evaluations the (tiny) tables transfer
  to host and the rounds finish in numpy — identical values, and the
  number of distinct compiled shapes stays bounded on slow-compile
  backends (axon).

Under a 1-D mesh the tables are sharded over the trace axis: the fold
splits at half (one collective-permute), the round sums become psum'd
shard partials — exactly SURVEY.md §2.11's "sumcheck round collective".

Bit-equality with the host prover is enforced by
tests/test_zerocheck_dev.py.
"""

from __future__ import annotations

from typing import Dict, List

import jax
import jax.numpy as jnp
import numpy as np

from ..core.hash import FiatShamirTranscript
from .babybear import P, R_MOD_P, add_mod, from_mont, mont_mul, np_to_mont, sub_mod, to_mont
from .mle import fold_msb, sum_mod

__all__ = ["DeviceZerocheckProver", "V2_ROW_ORDER", "eq_table_device"]

# Stacked-row order for the v2 combiner (must match v2_columns' names plus
# the logUp columns).  "__"-prefixed rows are PUBLIC MLEs (index/selectors,
# poly/public_mles.py): built on device from the public step count, folded
# like any table, but never reported as column evals.
V2_ROW_ORDER = (
    "x0", "is_read", "pc", "seq", "next_pc", "g1", "g2",
    "__idx__", "__sel1__", "__sel2__",
)
V2_COMMITTED_ROWS = tuple(n for n in V2_ROW_ORDER if not n.startswith("__"))

# Remaining table width below which rounds finish on host numpy.
HOST_TAIL = 1 << 12


@jax.jit
def _eq_table_jit(taus_m, bits):
    """eq(tau, .) over the hypercube in Montgomery form.

    ``bits`` is (v, n) uint32 with bits[j][i] = bit (v-1-j) of i — tau_j
    controls the MSB-first fold variable j (matching zerocheck._eq_table's
    reversed-concat construction)."""
    n = bits.shape[1]
    acc = jnp.full((n,), jnp.uint32(R_MOD_P))
    for j in range(bits.shape[0]):
        tau = jnp.broadcast_to(taus_m[j], (n,))
        one_minus = jnp.broadcast_to(sub_mod(jnp.uint32(R_MOD_P), taus_m[j]), (n,))
        factor = jnp.where(bits[j] == 1, tau, one_minus)
        acc = mont_mul(acc, factor)
    return acc


def eq_table_device(taus: List[int], n: int, sharding=None):
    """(n,) mont eq table from canonical tau challenges, built on device."""
    v = len(taus)
    idx = jnp.arange(n, dtype=jnp.uint32)
    if sharding is not None:
        idx = jax.device_put(idx, sharding)
    bits = jnp.stack([(idx >> jnp.uint32(v - 1 - j)) & jnp.uint32(1) for j in range(v)])
    taus_m = jnp.asarray(np_to_mont(np.asarray(taus, dtype=np.uint64)))
    return _eq_table_jit(taus_m, bits)


def _v2_combiner_dev(cols, alphas_m, tb_m):
    """Montgomery-lane twin of constraints.v2.make_v2_combiner (same
    constraint order: x0 = 0; is_read, seq boolean; seq * (next_pc - pc -
    4) = 0; the two logUp inverse constraints).  ``tb_m`` = mont (tau,
    beta) scalars."""
    one = jnp.uint32(R_MOD_P)
    x0, is_read, pc, seq, next_pc, g1, g2, idx, sel1, sel2 = cols
    four_m = jnp.uint32((4 * R_MOD_P) % P)

    c1 = x0
    c2 = mont_mul(is_read, sub_mod(jnp.broadcast_to(one, is_read.shape), is_read))
    c3 = mont_mul(seq, sub_mod(jnp.broadcast_to(one, seq.shape), seq))
    delta = sub_mod(sub_mod(next_pc, pc), jnp.broadcast_to(four_m, pc.shape))
    c4 = mont_mul(seq, delta)

    tau = jnp.broadcast_to(tb_m[0], idx.shape)
    beta = jnp.broadcast_to(tb_m[1], idx.shape)
    fp1 = sub_mod(sub_mod(tau, mont_mul(beta, add_mod(idx, jnp.broadcast_to(one, idx.shape)))), next_pc)
    fp2 = sub_mod(sub_mod(tau, mont_mul(beta, idx)), pc)
    c5 = sub_mod(mont_mul(g1, fp1), sel1)
    c6 = sub_mod(mont_mul(g2, fp2), sel2)

    acc = mont_mul(jnp.broadcast_to(alphas_m[0], c1.shape), c1)
    acc = add_mod(acc, mont_mul(jnp.broadcast_to(alphas_m[1], c2.shape), c2))
    acc = add_mod(acc, mont_mul(jnp.broadcast_to(alphas_m[2], c3.shape), c3))
    acc = add_mod(acc, mont_mul(jnp.broadcast_to(alphas_m[3], c4.shape), c4))
    acc = add_mod(acc, mont_mul(jnp.broadcast_to(alphas_m[4], c5.shape), c5))
    return add_mod(acc, mont_mul(jnp.broadcast_to(alphas_m[5], c6.shape), c6))


@jax.jit
def _round_evals_jit(stacked_m, eq_m, alphas_m, t_consts_m, tb_m):
    """g(0..degree) for one round: stacked_m (C, n), eq_m (n,).

    t_consts_m holds (t, 1-t) mont pairs for t >= 2 (static count =
    degree - 1)."""
    half = stacked_m.shape[-1] // 2
    cols0 = stacked_m[:, :half]
    cols1 = stacked_m[:, half:]
    eq0 = eq_m[:half]
    eq1 = eq_m[half:]

    def z_sum(cols_at_t, eq_at_t):
        c = _v2_combiner_dev(
            [cols_at_t[i] for i in range(cols_at_t.shape[0])], alphas_m, tb_m
        )
        return sum_mod(mont_mul(eq_at_t, c))

    evals = [z_sum(cols0, eq0), z_sum(cols1, eq1)]
    for k in range(t_consts_m.shape[0]):
        t_m = t_consts_m[k, 0]
        omt_m = t_consts_m[k, 1]
        cols_t = add_mod(mont_mul(jnp.broadcast_to(omt_m, cols0.shape), cols0),
                         mont_mul(jnp.broadcast_to(t_m, cols0.shape), cols1))
        eq_t = add_mod(mont_mul(jnp.broadcast_to(omt_m, eq0.shape), eq0),
                       mont_mul(jnp.broadcast_to(t_m, eq1.shape), eq1))
        evals.append(z_sum(cols_t, eq_t))
    return jnp.stack(evals)


@jax.jit
def _fold_pair_jit(stacked_m, eq_m, r_m):
    return fold_msb(stacked_m, r_m), fold_msb(eq_m, r_m)


class DeviceZerocheckProver:
    """Drop-in device twin of proofs.zerocheck.ZerocheckProver for the v2
    constraint system (fixed combiner), BabyBear only.

    ``columns`` maps the committed V2_ROW_ORDER names to device or numpy
    canonical arrays; device arrays (e.g. witness rows already resident
    from the commitment forest) are used without another transfer.  The
    "__"-prefixed public rows (index + logUp selectors) are built ON
    DEVICE from ``num_steps`` — no transfer.  ``tau``/``beta`` are the
    logUp fingerprint challenges (already drawn upstream)."""

    def __init__(self, F, columns: Dict[str, object], degree: int, num_alphas: int,
                 num_steps: int, tau: int, beta: int, mesh=None):
        assert F.MODULUS == P, "device zerocheck is BabyBear-only"
        self.F = F
        self.degree = degree
        self.num_alphas = num_alphas
        self.num_steps = num_steps
        self.tau = tau
        self.beta = beta
        self.mesh = mesh
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as PS

            self._sharding = NamedSharding(mesh, PS("trace"))
            self._row_sharding = NamedSharding(mesh, PS(None, "trace"))
        else:
            self._sharding = None
            self._row_sharding = None
        n = None
        rows = []
        for name in V2_COMMITTED_ROWS:
            col = columns[name]
            if isinstance(col, np.ndarray):
                col = jnp.asarray(col.astype(np.uint32))
            n = col.shape[-1]
            rows.append(col)
        idx = jnp.arange(n, dtype=jnp.int32)  # n <= 2^30 << int32 max
        if self._sharding is not None:
            idx = jax.device_put(idx, self._sharding)
        sel1 = (idx <= num_steps - 2).astype(jnp.uint32)
        sel2 = ((idx >= 1) & (idx <= num_steps - 1)).astype(jnp.uint32)
        rows += [idx.astype(jnp.uint32), sel1, sel2]
        stacked = jnp.stack(rows)
        if self._row_sharding is not None:
            stacked = jax.device_put(stacked, self._row_sharding)
        self._stacked_canonical = stacked

    def prove(self, transcript: FiatShamirTranscript):
        from ..proofs.zerocheck import ZerocheckProof, _eval_at_t, _fold_msb

        F = self.F
        p = P
        n = self._stacked_canonical.shape[-1]
        num_vars = n.bit_length() - 1

        taus = [transcript.challenge_value(p) for _ in range(num_vars)]
        alphas = [transcript.challenge_value(p) for _ in range(self.num_alphas)]
        alphas_m = jnp.asarray(np_to_mont(np.asarray(alphas, dtype=np.uint64)))
        t_consts = np.array(
            [[t % p, (1 - t) % p] for t in range(2, self.degree + 1)], dtype=np.uint64
        )
        t_consts_m = jnp.asarray(np_to_mont(t_consts))
        tb_m = jnp.asarray(
            np_to_mont(np.array([self.tau % p, self.beta % p], dtype=np.uint64))
        )

        stacked_m = to_mont(self._stacked_canonical)
        eq_m = eq_table_device(taus, n, self._sharding)

        round_evals: List[List[int]] = []
        rs: List[int] = []
        host_tables = None  # numpy dict once we cross to the host tail
        while len(rs) < num_vars:
            width = n >> len(rs)
            if host_tables is None and width <= HOST_TAIL:
                arr = np.asarray(from_mont(stacked_m), dtype=np.uint64)
                host_tables = {name: arr[i] for i, name in enumerate(V2_ROW_ORDER)}
                host_tables["__eq__"] = np.asarray(from_mont(eq_m), dtype=np.uint64)
            if host_tables is not None:
                evals_this_round = self._host_round(host_tables, alphas, p)
            else:
                dev = np.asarray(
                    from_mont(
                        _round_evals_jit(stacked_m, eq_m, alphas_m, t_consts_m, tb_m)
                    ),
                    dtype=np.uint64,
                )
                evals_this_round = [int(x) for x in dev]
            round_evals.append(evals_this_round)
            for g in evals_this_round:
                transcript.append_u64(g)
            r = transcript.challenge_value(p)
            rs.append(r)
            if host_tables is not None:
                host_tables = {k: _fold_msb(t, r, p) for k, t in host_tables.items()}
            else:
                r_m = jnp.asarray(np_to_mont(np.array([r], dtype=np.uint64)))
                stacked_m, eq_m = _fold_pair_jit(stacked_m, eq_m, r_m)

        if host_tables is not None:
            column_evals = {
                name: int(host_tables[name][0]) for name in V2_COMMITTED_ROWS
            }
        else:
            finals = np.asarray(from_mont(stacked_m[:, 0]), dtype=np.uint64)
            column_evals = {
                name: int(finals[i]) for i, name in enumerate(V2_ROW_ORDER)
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

    def _host_round(self, tables, alphas, p):
        """Identical per-round evaluation to the host ZerocheckProver."""
        from ..constraints.v2 import make_v2_combiner
        from ..proofs.zerocheck import _eval_at_t

        combiner = make_v2_combiner(self.tau, self.beta)
        evals = []
        for t in range(self.degree + 1):
            at_t = {name: _eval_at_t(tab, t, p) for name, tab in tables.items()}
            c_vals = combiner(at_t, alphas, p)
            z_vals = at_t["__eq__"] * c_vals % np.uint64(p)
            evals.append(int(z_vals.sum(dtype=np.uint64)) % p)
        return evals
