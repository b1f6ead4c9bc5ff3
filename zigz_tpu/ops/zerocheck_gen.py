"""Generic device zerocheck: any combiner's rounds on TPU via symtrace.

the round-2 device zerocheck hand-ported the v2 *main* combiner to
Montgomery lanes; this module covers every OTHER zerocheck in the protocol
(bytecode fetch/decode, register-file and RAM memory checks, lookup
validity, query linkage) by symbolically tracing the call site's own numpy
combiner (ops/symtrace.py) and running the per-round sweeps on device:

* one (C, n) canonical->Montgomery upload of all columns;
* eq(tau, .) built on device from the tau challenges;
* per round one fused jit program evaluates g(0) and g(2..degree) — g(1) is
  derived from the running claim exactly like the host prover — and one more
  jit folds all tables;
* below ``host_tail`` remaining width the tables move to host and the rounds
  finish with the ORIGINAL combiner in numpy (bounds the number of compiled
  shapes on slow-compile backends, and keeps tiny-shape edge cases on the
  reference path).

Transcript bytes and the returned proof are identical to the host
ZerocheckProver's (tests/test_zerocheck_gen.py): every device op reduces
mod p, so the canonical integers absorbed per round are the same.

Challenge-derived constants inside the combiner closure (taus, gammas,
logUp fingerprint coefficients, ...) are runtime PARAMETERS of the compiled
program (symtrace interning), so XLA compiles once per (combiner structure,
shape) — not once per proof.
"""

from __future__ import annotations

import os
from typing import Dict, List

import numpy as np

from ..core.hash import FiatShamirTranscript
from .symtrace import TraceError, compile_device, trace_combiner

__all__ = ["GenericDeviceZerocheck", "zerocheck_device_pref"]


def _eq_table_jit_factory():
    import jax
    import jax.numpy as jnp

    from .babybear import R_MOD_P, mont_mul, sub_mod

    @jax.jit
    def _eq_table_jit(taus_m, bits):
        """eq(tau, .) over the hypercube in Montgomery form.

        ``bits`` is (v, n) uint32 with bits[j][i] = bit (v-1-j) of i —
        tau_j controls the MSB-first fold variable j (matching
        zerocheck._eq_table's reversed-concat construction)."""
        n = bits.shape[1]
        acc = jnp.full((n,), jnp.uint32(R_MOD_P))
        for j in range(bits.shape[0]):
            tau = jnp.broadcast_to(taus_m[j], (n,))
            one_minus = jnp.broadcast_to(sub_mod(jnp.uint32(R_MOD_P), taus_m[j]), (n,))
            factor = jnp.where(bits[j] == 1, tau, one_minus)
            acc = mont_mul(acc, factor)
        return acc

    return _eq_table_jit


_eq_table_jit = None


def eq_table_device(taus, n: int, sharding=None):
    """(n,) mont eq table from canonical tau challenges, built on device."""
    global _eq_table_jit
    import jax
    import jax.numpy as jnp

    from .babybear import np_to_mont

    if _eq_table_jit is None:
        _eq_table_jit = _eq_table_jit_factory()
    v = len(taus)
    idx = jnp.arange(n, dtype=jnp.uint32)
    if sharding is not None:
        idx = jax.device_put(idx, sharding)
    bits = jnp.stack([(idx >> jnp.uint32(v - 1 - j)) & jnp.uint32(1) for j in range(v)])
    taus_m = jnp.asarray(np_to_mont(np.asarray(taus, dtype=np.uint64)))
    return _eq_table_jit(taus_m, bits)

P = 2013265921

# Remaining table width below which rounds finish on host numpy.
HOST_TAIL = 1 << 12

# Minimum starting width for the device path to win over host numpy
# (uploads + per-round dispatch amortize only on large tables).
MIN_DEVICE_WIDTH = 1 << 15

# Host->device bandwidth below which auto mode stays on host: the columns
# are built host-side, so the upload (4 bytes/elem) must beat the host
# prover's whole degree+1-sweep round schedule (~20ns/elem) to pay off.
# Co-located chips (PCIe, >= 10 GB/s) clear this easily; a tunneled remote
# chip (tens of MB/s) never does.
MIN_AUTO_BW_MBPS = 1000.0

_measured_bw: list = []  # one-element cache


def device_transfer_mbps() -> float:
    """Measured host->device bandwidth (MB/s), probed with an 8 MB
    upload.  A LOW cached measurement is re-probed (keeping the max of
    up to 3 probes): the first probe can land while earlier async device
    work still saturates the link — in the round-5 bench dress rehearsal
    that one stale number silently routed every v2 commit to the 3-4x
    slower host path for the rest of the process."""
    import time

    import jax
    import numpy as np

    def probe() -> float:
        buf = np.zeros((8 << 20) // 4, dtype=np.uint32)
        jax.block_until_ready(jax.device_put(buf[:1024]))  # warm the path
        t0 = time.perf_counter()
        jax.block_until_ready(jax.device_put(buf))
        return 8.0 / (time.perf_counter() - t0)

    if not _measured_bw:
        _measured_bw.append(probe())
    elif _measured_bw[0] < 60.0 and len(_measured_bw) < 3:
        _measured_bw[0] = max(_measured_bw[0], probe())
        _measured_bw.append(0.0)  # retry counter
    return _measured_bw[0]


def zerocheck_device_pref() -> str:
    """"auto" (device on fast-transfer TPU backends, host otherwise) |
    "device" | "host"."""
    return os.environ.get("ZIGZ_TPU_ZEROCHECK", "auto")


class GenericDeviceZerocheck:
    """Drop-in device twin of proofs.zerocheck.ZerocheckProver.

    Construction traces the combiner; any TraceError propagates BEFORE the
    transcript is touched, so callers can fall back to the host prover.
    """

    def __init__(self, F, columns: Dict[str, np.ndarray], combiner, degree: int,
                 num_alphas: int = None, mesh=None, host_tail: int = None):
        assert F.MODULUS == P, "device zerocheck is BabyBear-only"
        if host_tail is None:
            host_tail = int(os.environ.get("ZIGZ_TPU_ZEROCHECK_TAIL", HOST_TAIL))
        self.F = F
        self.combiner = combiner
        self.degree = degree
        self.num_alphas = num_alphas if num_alphas is not None else len(columns)
        self.mesh = mesh
        self.host_tail = max(1, host_tail)

        self.names = sorted(columns)
        any_col = columns[self.names[0]]
        n = any_col.shape[-1]
        assert n & (n - 1) == 0, "zerocheck tables must be power-of-two"
        self.n = n
        self.columns = columns

        # Trace with placeholder alphas (values are parameter slots; the
        # real alphas are traced again per prove() for their fresh values).
        self._probe_trace = trace_combiner(
            combiner, self.names, [1] * self.num_alphas, P
        )

    # ------------------------------------------------------------------
    def prove(self, transcript: FiatShamirTranscript):
        import jax
        import jax.numpy as jnp

        from ..proofs.zerocheck import ZerocheckProof, _fold_msb, _interp_eval
        from .babybear import from_mont, mont_mul, np_to_mont, to_mont
        from .mle import fold_msb, sum_mod

        F = self.F
        p = P
        n = self.n
        num_vars = n.bit_length() - 1

        taus = [transcript.challenge_value(p) for _ in range(num_vars)]
        alphas = [transcript.challenge_value(p) for _ in range(self.num_alphas)]

        # Re-trace with the fresh challenge values; structure must match the
        # probe trace (combiner control flow is challenge-independent).
        tr = trace_combiner(self.combiner, self.names, alphas, p)
        if tr.signature != self._probe_trace.signature:
            raise TraceError("combiner structure depends on challenge values")
        row_of = {name: i for i, name in enumerate(self.names)}
        dag = compile_device(tr.signature, row_of)
        consts_m = jnp.asarray(np_to_mont(np.asarray(tr.consts, dtype=np.uint64)))

        sharding = row_sharding = None
        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as PS

            sharding = NamedSharding(self.mesh, PS("trace"))
            row_sharding = NamedSharding(self.mesh, PS(None, "trace"))

        stacked = np.stack(
            [np.asarray(self.columns[name], dtype=np.uint64) % np.uint64(p)
             for name in self.names]
        ).astype(np.uint32)
        stacked = jnp.asarray(stacked)
        if row_sharding is not None:
            stacked = jax.device_put(stacked, row_sharding)
        stacked_m = to_mont(stacked)
        eq_m = eq_table_device(taus, n, sharding)

        round_fn = self._round_fn(dag, self.degree)
        fold_fn = self._fold_fn()

        round_evals: List[List[int]] = []
        rs: List[int] = []
        claim = 0
        host_tables = None
        while len(rs) < num_vars:
            width = n >> len(rs)
            if host_tables is None and width <= self.host_tail:
                arr = np.asarray(from_mont(stacked_m), dtype=np.uint64)
                host_tables = {name: arr[i] for i, name in enumerate(self.names)}
                host_tables["__eq__"] = np.asarray(from_mont(eq_m), dtype=np.uint64)
            if host_tables is not None:
                evals_this_round = self._host_round(host_tables, alphas, claim, p)
            else:
                dev = np.asarray(
                    from_mont(round_fn(stacked_m, eq_m, consts_m)), dtype=np.uint64
                )
                g0 = int(dev[0])
                evals_this_round = [g0, (claim - g0) % p]
                evals_this_round += [int(x) for x in dev[1:]]
            round_evals.append(evals_this_round)
            for g in evals_this_round:
                transcript.append_u64(g)
            r = transcript.challenge_value(p)
            rs.append(r)
            claim = _interp_eval(evals_this_round, r, p)
            if host_tables is not None:
                host_tables = {k: _fold_msb(t, r, p) for k, t in host_tables.items()}
            else:
                r_m = jnp.asarray(np_to_mont(np.array([r], dtype=np.uint64)))
                stacked_m, eq_m = fold_fn(stacked_m, eq_m, r_m)

        if host_tables is not None:
            column_evals = {
                name: int(host_tables[name][0])
                for name in self.names if not name.startswith("__")
            }
        else:
            finals = np.asarray(from_mont(stacked_m[:, 0]), dtype=np.uint64)
            column_evals = {
                name: int(finals[i]) for i, name in enumerate(self.names)
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

    # ------------------------------------------------------------------
    def _host_round(self, tables, alphas, claim: int, p: int) -> List[int]:
        """Identical schedule to ZerocheckProver.prove's round body."""
        from ..proofs.zerocheck import _eval_at_t

        P64 = np.uint64(p)

        def combined_sum(at):
            c_vals = self.combiner(at, alphas, p)
            return int((at["__eq__"] * c_vals % P64).sum(dtype=np.uint64)) % p

        at0 = {name: _eval_at_t(tab, 0, p) for name, tab in tables.items()}
        g0 = combined_sum(at0)
        evals = [g0, (claim - g0) % p]
        if self.degree >= 2:
            deltas = {
                name: (tab[..., tab.shape[-1] // 2:] + P64
                       - tab[..., : tab.shape[-1] // 2]) % P64
                for name, tab in tables.items()
            }
            cur = {name: _eval_at_t(tab, 1, p).copy() for name, tab in tables.items()}
            for _t in range(2, self.degree + 1):
                for name in cur:
                    cur[name] = (cur[name] + deltas[name]) % P64
                evals.append(combined_sum(cur))
        return evals

    # ------------------------------------------------------------------
    _ROUND_FNS: Dict[tuple, object] = {}
    _FOLD_FN = None

    def _round_fn(self, dag, degree: int):
        """g(0) and g(2..degree) for one round, one fused jit program.

        g(1) is derived from the claim on host (matching the host prover's
        schedule — one combiner sweep saved per round)."""
        key = (id(dag), degree)
        fn = self._ROUND_FNS.get(key)
        if fn is not None:
            return fn

        import jax
        import jax.numpy as jnp

        from .babybear import add_mod, mont_mul, sub_mod
        from .mle import sum_mod

        def run(stacked_m, eq_m, consts_m):
            half = stacked_m.shape[-1] // 2
            lo = stacked_m[:, :half]
            hi = stacked_m[:, half:]
            eq0 = eq_m[:half]
            eq1 = eq_m[half:]
            evals = [sum_mod(mont_mul(eq0, dag(lo, consts_m)))]
            if degree >= 2:
                delta = sub_mod(hi, lo)
                deq = sub_mod(eq1, eq0)
                cur, eqc = hi, eq1
                for _t in range(2, degree + 1):
                    cur = add_mod(cur, delta)
                    eqc = add_mod(eqc, deq)
                    evals.append(sum_mod(mont_mul(eqc, dag(cur, consts_m))))
            return jnp.stack(evals)

        fn = jax.jit(run)
        self._ROUND_FNS[key] = fn
        return fn

    def _fold_fn(self):
        if GenericDeviceZerocheck._FOLD_FN is None:
            import jax

            from .mle import fold_msb

            @jax.jit
            def fold_pair(stacked_m, eq_m, r_m):
                return fold_msb(stacked_m, r_m), fold_msb(eq_m, r_m)

            GenericDeviceZerocheck._FOLD_FN = fold_pair
        return GenericDeviceZerocheck._FOLD_FN
