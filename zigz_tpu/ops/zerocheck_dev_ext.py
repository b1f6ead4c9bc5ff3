"""Extension-field zerocheck prover on TPU Montgomery lanes.

Device twin of :class:`zigz_tpu.ops.zerocheck_native_ext.NativeZerocheckExtProver`
(itself the C++ twin of ``proofs.zerocheck.ZerocheckExtProver``): the
combiner is symbolically traced once (ops/symtrace.trace_combiner_ext) and
the resulting base-op DAG is evaluated as fused XLA kernels over
``uint32`` Montgomery planes (ops/babybear, ops/ext4_dev).  All three
provers emit byte-identical transcripts and proofs
(tests/test_zerocheck_dev_ext.py).

Why a third backend: the round-3 protocol draws every challenge from
BabyBear^4, so the zerocheck tables turn into 4-coordinate extension
tables after round 1 — at 2^20 trace length the host C++ sweep costs
~11 s of the v2 prove.  On device each round is ONE dispatch (the fold by
the previous round's challenge is fused into the next round's evaluation
sweep, so the per-round cost is a single host<->device round trip) and the
tail rounds finish on host numpy below ``host_tail`` width.

Engagement policy mirrors ops/zerocheck_gen.py: explicit
``ZIGZ_TPU_ZEROCHECK=device``, or auto on a TPU backend when the table
width is at least ``MIN_DEVICE_EXT_WIDTH`` — per-round dispatch latency
(~35 ms through a tunneled chip) swamps the compute win below that.
``dev_columns`` lets callers pass columns that already live on device
(e.g. gathered from a Ligero commit's device-resident matrix) so the
host->device upload is skipped entirely.
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional

import numpy as np

from ..core.ext4 import Ext4, challenge_ext, ext_from_ints
from .symtrace import TraceError, trace_combiner_ext

__all__ = ["GenericDeviceZerocheckExt", "MIN_DEVICE_EXT_WIDTH", "ext_device_ok"]

P = 2013265921

# Below this starting width the native C++ prover wins.  Measured on the
# tunneled single-chip setup: per-zerocheck device overhead is ~1.2 s
# (8-10 sequential round dispatches at ~35 ms latency each + assembly),
# while the threaded AVX-512 host prover sweeps a 2^20-width real v2
# combiner in ~1 s — so the device only pays at 2^22+ widths there.  On a
# co-located chip (micro-second dispatch) lower this via
# ZIGZ_TPU_ZEROCHECK=device; the multichip mesh path always uses it.
MIN_DEVICE_EXT_WIDTH = 1 << 22

# Remaining-width threshold to finish rounds on host numpy.
HOST_TAIL_EXT = 1 << 12


def ext_device_ok(n: int) -> bool:
    """Auto-mode engagement check (callers may also force via env)."""
    pref = os.environ.get("ZIGZ_TPU_ZEROCHECK", "auto")
    if pref == "device":
        return True
    if pref != "auto" or n < MIN_DEVICE_EXT_WIDTH:
        return False
    try:
        import jax

        return jax.default_backend() == "tpu"
    except Exception:
        return False


def _r_mont(r) -> np.ndarray:
    """Host Ext4 scalar challenge -> (4,) mont uint32 numpy (transferred to
    device as part of the next step dispatch)."""
    from .babybear import np_to_mont

    return np_to_mont(np.asarray(r.to_ints(), dtype=np.uint64))


def _compile_dag_multi(signature, row_of):
    """DAG -> jitted fn(planes (C, n) mont u32, consts (K,) mont u32) ->
    (4, n) mont u32 (the four output coordinates of eq * C)."""
    import jax.numpy as jnp

    from .babybear import add_mod, mont_mul, sub_mod
    from .symtrace import _ADD, _COL, _CONST, _MUL, _SUB, _ZERO

    nodes, outs, _col_names = signature
    rows = [row_of[a] if op == _COL else None for (op, a, _b) in nodes]

    def run(planes, consts_m):
        n = planes.shape[-1]
        vals: List[object] = [None] * len(nodes)
        zero = None
        for i, (op, a, b) in enumerate(nodes):
            if op == _COL:
                vals[i] = planes[rows[i]]
            elif op == _CONST:
                vals[i] = jnp.broadcast_to(consts_m[a], (n,))
            elif op == _ZERO:
                if zero is None:
                    zero = jnp.zeros((n,), jnp.uint32)
                vals[i] = zero
            elif op == _ADD:
                vals[i] = add_mod(vals[a], vals[b])
            elif op == _SUB:
                vals[i] = sub_mod(vals[a], vals[b])
            else:  # _MUL
                vals[i] = mont_mul(vals[a], vals[b])
        return jnp.stack([vals[o] for o in outs])

    return run


def _round_sums(dag, planes, consts_m, degree):
    """g(0), g(2..degree) coordinate sums: (degree, 4) mont u32."""
    import jax.numpy as jnp

    from .babybear import add_mod, sub_mod
    from .mle import sum_mod

    half = planes.shape[-1] // 2
    lo = planes[:, :half]
    hi = planes[:, half:]
    evals = [sum_mod(dag(lo, consts_m), axis=-1)]
    if degree >= 2:
        delta = sub_mod(hi, lo)
        cur = hi
        for _t in range(2, degree + 1):
            cur = add_mod(cur, delta)
            evals.append(sum_mod(dag(cur, consts_m), axis=-1))
    return jnp.stack(evals)  # (degree, 4)


class GenericDeviceZerocheckExt:
    """Drop-in device twin of proofs.zerocheck.ZerocheckExtProver.

    ``columns`` values: base canonical uint64 numpy arrays, Ext4 arrays, or
    (via ``dev_columns``) base canonical uint32 jax arrays already resident
    on the device.  Construction traces the combiner; TraceError propagates
    BEFORE the transcript is touched so callers can fall back."""

    # jit caches keyed by (dag signature, layout, degree, width).
    _ROUND1_FNS: Dict[tuple, object] = {}
    _STEP_FNS: Dict[tuple, object] = {}
    _FOLD_FNS: Dict[tuple, object] = {}

    def __init__(self, F, columns: Dict[str, np.ndarray], combiner, degree: int,
                 num_alphas: int = None,
                 dev_columns: Optional[Dict[str, object]] = None,
                 host_tail: int = None):
        assert F.MODULUS == P, "device ext zerocheck is BabyBear-only"
        self.F = F
        self.combiner = combiner
        self.degree = degree
        self.num_alphas = num_alphas if num_alphas is not None else len(columns)
        self.columns = columns
        self.dev_columns = dev_columns or {}
        self.host_tail = max(2, host_tail if host_tail is not None
                             else int(os.environ.get("ZIGZ_TPU_ZEROCHECK_TAIL",
                                                     HOST_TAIL_EXT)))
        self.base_names = sorted(
            n for n, c in columns.items() if not isinstance(c, Ext4)
        )
        self.ext_names = sorted(n for n, c in columns.items() if isinstance(c, Ext4))
        widths = [
            (c.shape[-1] if isinstance(c, Ext4) else np.shape(c)[-1])
            for c in columns.values()
        ]
        n = widths[0]
        assert all(w == n for w in widths), "zerocheck tables must be equal width"
        assert n & (n - 1) == 0 and n >= 2, "zerocheck tables must be power-of-two"
        self.n = n
        probe = [ext_from_ints([1, 0, 0, 0])] * self.num_alphas
        self._probe1 = trace_combiner_ext(
            combiner, self.base_names, self.ext_names, probe, P, lift_base=False
        )
        self._probe2 = trace_combiner_ext(
            combiner, self.base_names, self.ext_names, probe, P, lift_base=True
        )

    # ------------------------------------------------------------------
    def _row_maps(self):
        B, E = len(self.base_names), len(self.ext_names)
        row_of1: Dict[str, int] = {}
        for i, name in enumerate(self.base_names):
            row_of1[f"{name}#0"] = i
        for j, name in enumerate(self.ext_names):
            for e in range(4):
                row_of1[f"{name}#{e}"] = B + 4 * j + e
        for e in range(4):
            row_of1[f"__eq__#{e}"] = B + 4 * E + e
        names = self.base_names + self.ext_names
        row_of2: Dict[str, int] = {}
        for i, name in enumerate(names):
            for e in range(4):
                row_of2[f"{name}#{e}"] = 4 * i + e
        for e in range(4):
            row_of2[f"__eq__#{e}"] = 4 * len(names) + e
        return row_of1, row_of2

    _ASSEMBLE_FNS: Dict[tuple, object] = {}

    def _assemble_fn(self, key):
        """One-dispatch plane-stack assembly (see prove)."""
        fn = self._ASSEMBLE_FNS.get(key)
        if fn is None:
            import jax
            import jax.numpy as jnp

            from .babybear import to_mont
            from .ext4_dev import ext_eq_table_dev

            n, kinds, _dev_shapes, E = key

            def run(dev_list, host_mat, ext_mat, taus_m):
                host_m = to_mont(host_mat)
                rows = []
                for kind in kinds:
                    if kind[0] == "dev":
                        rows.append(to_mont(dev_list[kind[1]].reshape(-1)))
                    elif kind[0] == "ref":
                        _tag, mi, off, rcnt, length = kind
                        flat = dev_list[mi][off : off + rcnt].reshape(-1)
                        rows.append(to_mont(flat[:length]))
                    else:
                        rows.append(host_m[kind[1]])
                if E:
                    rows.append(to_mont(ext_mat).reshape(4 * E, n))
                taus_dev = [taus_m[j] for j in range(taus_m.shape[0])]
                eq4 = ext_eq_table_dev(taus_dev, n)
                parts = [r.reshape(1, n) if r.ndim == 1 else r for r in rows]
                parts.append(eq4)
                return jnp.concatenate(parts, axis=0)

            fn = jax.jit(run)
            self._ASSEMBLE_FNS[key] = fn
        return fn

    def _round1_fn(self, key, dag1):
        fn = self._ROUND1_FNS.get(key)
        if fn is None:
            import jax

            degree = self.degree

            def run(planes, consts_m):
                return _round_sums(dag1, planes, consts_m, degree)

            fn = jax.jit(run)
            self._ROUND1_FNS[key] = fn
        return fn

    def _hybrid_step_fn(self, key, dag2, B, E):
        """fold round-1 layout by r (base rows -> ext groups) then round
        sums at the halved width: ONE dispatch."""
        fn = self._STEP_FNS.get(key)
        if fn is None:
            import jax
            import jax.numpy as jnp

            from .ext4_dev import ext_fold_base_dev, ext_fold_dev

            degree = self.degree

            def run(planes, r4, consts_m):
                parts = []
                for i in range(B):
                    parts.append(ext_fold_base_dev(planes[i], r4))
                for j in range(E + 1):  # ext columns then eq, in layout order
                    grp = planes[B + 4 * j : B + 4 * j + 4]
                    parts.append(ext_fold_dev(grp, r4))
                folded = jnp.concatenate(parts, axis=0)
                return folded, _round_sums(dag2, folded, consts_m, degree)

            fn = jax.jit(run)
            self._STEP_FNS[key] = fn
        return fn

    def _ext_step_fn(self, key, dag2, groups, with_sums: bool):
        """fold all-ext layout by r, then (optionally) round sums."""
        cache = self._STEP_FNS if with_sums else self._FOLD_FNS
        fn = cache.get(key)
        if fn is None:
            import jax
            import jax.numpy as jnp

            from .ext4_dev import ext_fold_dev

            degree = self.degree

            def run(planes, r4, consts_m):
                g4 = planes.reshape(groups, 4, planes.shape[-1])
                # vmap the ext fold over column groups.
                folded = jax.vmap(ext_fold_dev, in_axes=(0, None))(g4, r4)
                folded = folded.reshape(groups * 4, planes.shape[-1] // 2)
                if with_sums:
                    return folded, _round_sums(dag2, folded, consts_m, degree)
                return folded

            fn = jax.jit(run)
            cache[key] = fn
        return fn

    # ------------------------------------------------------------------
    def prove(self, transcript):
        import jax.numpy as jnp

        from ..proofs.zerocheck import (
            ZerocheckProof,
            _add_g,
            _at_t_g,
            _delta_g,
            _eq_table_ext,
            _fold_ext,
            _interp_eval_ext,
            _width,
            absorb_ext,
        )
        from .babybear import np_to_mont
        from .ext4_dev import ext_from_device

        p = P
        n = self.n
        num_vars = n.bit_length() - 1

        taus = [challenge_ext(transcript) for _ in range(num_vars)]
        alphas = [challenge_ext(transcript) for _ in range(self.num_alphas)]

        tr1 = trace_combiner_ext(
            self.combiner, self.base_names, self.ext_names, alphas, p,
            lift_base=False,
        )
        tr2 = trace_combiner_ext(
            self.combiner, self.base_names, self.ext_names, alphas, p,
            lift_base=True,
        )
        if (tr1.signature != self._probe1.signature
                or tr2.signature != self._probe2.signature):
            raise TraceError("combiner structure depends on challenge values")

        row_of1, row_of2 = self._row_maps()
        dag1 = _compile_dag_multi(tr1.signature, row_of1)
        dag2 = _compile_dag_multi(tr2.signature, row_of2)
        key1 = (self._probe1.signature, tuple(sorted(row_of1.items())), self.degree)
        key2 = (self._probe2.signature, tuple(sorted(row_of2.items())), self.degree)
        consts1_m = jnp.asarray(np_to_mont(np.asarray(tr1.consts, dtype=np.uint64)))
        consts2_m = jnp.asarray(np_to_mont(np.asarray(tr2.consts, dtype=np.uint64)))

        B, E = len(self.base_names), len(self.ext_names)

        # Assemble the round-1 plane stack in MONT form with ONE device
        # dispatch: device-resident columns (canonical u32, any shape) ride
        # as jit args, host columns upload as one stacked canonical-u32
        # matrix (canonical compresses far better through a tunneled link
        # than Montgomery values would), the eq table builds on device from
        # the mont taus, and everything converts to mont inside the jit.
        dev_list = []
        host_rows = []
        kinds = []  # per base name:
        #   ("dev", idx)                       plain device array
        #   ("ref", idx, off, rows, length)    static slice of dev_list[idx]
        #   ("host", idx)                      row of the uploaded host_mat
        mat_ids: Dict[int, int] = {}  # id(parent matrix) -> dev_list index
        for name in self.base_names:
            dev = self.dev_columns.get(name)
            if dev is not None and hasattr(dev, "resolve"):  # DeviceColumnRef
                if dev.length == n:
                    mi = mat_ids.get(id(dev.mat))
                    if mi is None:
                        mi = len(dev_list)
                        dev_list.append(dev.mat)
                        mat_ids[id(dev.mat)] = mi
                    kinds.append(("ref", mi, dev.off, dev.rows, dev.length))
                    continue
                dev = None  # length mismatch: fall through to host upload
            if dev is not None and int(np.prod(dev.shape)) == n:
                kinds.append(("dev", len(dev_list)))
                dev_list.append(dev)
            else:
                arr = np.asarray(self.columns[name], dtype=np.uint64)
                if int(arr.max(initial=0)) >= p:
                    arr = arr % np.uint64(p)
                kinds.append(("host", len(host_rows)))
                host_rows.append(arr.astype(np.uint32))
        host_mat = (np.stack(host_rows) if host_rows
                    else np.zeros((0, n), dtype=np.uint32))
        ext_mat = (np.stack([
            np.asarray(self.columns[name].c, dtype=np.uint64).astype(np.uint32)
            for name in self.ext_names
        ]).reshape(4 * E, n) if E else np.zeros((0, n), dtype=np.uint32))
        taus_m = np.stack([
            np_to_mont(np.asarray(t.to_ints(), dtype=np.uint64)) for t in taus
        ])
        asm_key = (n, tuple(kinds), tuple(np.shape(d) for d in dev_list), E)
        planes = self._assemble_fn(asm_key)(dev_list, host_mat, ext_mat, taus_m)

        round_evals: List[List[Ext4]] = []
        rs: List[Ext4] = []
        claim = Ext4.zeros()
        width = n
        sums = None  # pending (degree, 4) device sums for the current round

        def emit_round(sums_np):
            nonlocal claim
            g0 = ext_from_ints([int(x) for x in sums_np[0]])
            evals_this_round = [g0, claim - g0]
            for t in range(2, self.degree + 1):
                evals_this_round.append(
                    ext_from_ints([int(x) for x in sums_np[t - 1]])
                )
            round_evals.append(evals_this_round)
            for g in evals_this_round:
                absorb_ext(transcript, g)
            r = challenge_ext(transcript)
            rs.append(r)
            claim = _interp_eval_ext(evals_this_round, r, p)
            return r

        # Round 0 on the round-1 layout.
        sums = self._round1_fn(key1 + (width,), dag1)(planes, consts1_m)
        r = emit_round(ext_from_device(sums))

        groups = B + E + 1
        rnd = 1
        while rnd < num_vars:
            width //= 2
            if width <= self.host_tail:
                break
            r_np = _r_mont(r)
            if rnd == 1:
                step = self._hybrid_step_fn(key2 + ("h", width), dag2, B, E)
            else:
                step = self._ext_step_fn(key2 + ("e", width), dag2, groups, True)
            planes, sums = step(planes, r_np, consts2_m)
            r = emit_round(ext_from_device(sums))
            rnd += 1

        # Tail: fold once more by the pending r, download, finish on host
        # numpy with the exact host-prover round body.
        if rnd < num_vars:
            # Download the CURRENT planes and fold on host (exact).  At
            # rnd == 1 the planes are still in round-1 layout (base columns
            # as single planes); afterwards they are all-ext.
            if rnd == 1:
                tables = self._planes_r1_to_host(planes, B, E)
            else:
                tables = self._planes_to_host(planes, B, E)
            tables = {k: _fold_ext(tab, r, p) for k, tab in tables.items()}
            while rnd < num_vars:
                at0 = {k: _at_t_g(tab, 0, p) for k, tab in tables.items()}
                g0 = self._combined_host_sum(at0, alphas, p)
                evals_this_round = [g0, claim - g0]
                if self.degree >= 2:
                    deltas = {k: _delta_g(tab, p) for k, tab in tables.items()}
                    cur = {k: _at_t_g(tab, 1, p) for k, tab in tables.items()}
                    for _t in range(2, self.degree + 1):
                        for k in cur:
                            cur[k] = _add_g(cur[k], deltas[k], p)
                        evals_this_round.append(
                            self._combined_host_sum(cur, alphas, p)
                        )
                round_evals.append(evals_this_round)
                for g in evals_this_round:
                    absorb_ext(transcript, g)
                r = challenge_ext(transcript)
                rs.append(r)
                claim = _interp_eval_ext(evals_this_round, r, p)
                tables = {k: _fold_ext(tab, r, p) for k, tab in tables.items()}
                rnd += 1
            column_evals = {
                name: Ext4(tab.c.reshape(4))
                for name, tab in tables.items() if not name.startswith("__")
            }
        else:
            # Folded all the way on device: fold by the final r, download.
            if num_vars == 1:
                tables = self._planes_r1_to_host(planes, B, E)
                tables = {k: _fold_ext(tab, r, p) for k, tab in tables.items()}
            else:
                fold_only = self._ext_step_fn(
                    key2 + ("f", width), dag2, groups, False
                )
                planes = fold_only(planes, _r_mont(r), consts2_m)
                tables = self._planes_to_host(planes, B, E)
            column_evals = {
                name: Ext4(tab.c.reshape(4))
                for name, tab in tables.items() if not name.startswith("__")
            }

        for name in sorted(column_evals):
            absorb_ext(transcript, column_evals[name])
        return ZerocheckProof(
            num_vars=num_vars,
            degree=self.degree,
            round_evals=round_evals,
            final_point=rs,
            column_evals=column_evals,
        )

    # ------------------------------------------------------------------
    def _planes_to_host(self, planes, B: int, E: int) -> Dict[str, Ext4]:
        """Download the all-ext plane stack as host Ext4 tables."""
        from .ext4_dev import ext_from_device

        arr = ext_from_device(planes)  # canonical u64 (planes, w)
        names = self.base_names + self.ext_names
        out: Dict[str, Ext4] = {}
        for i, name in enumerate(names):
            out[name] = Ext4(arr[4 * i : 4 * i + 4])
        out["__eq__"] = Ext4(arr[4 * len(names) : 4 * len(names) + 4])
        return out

    def _planes_r1_to_host(self, planes, B: int, E: int) -> Dict[str, object]:
        """Download the ROUND-1 plane layout: base columns as base uint64
        arrays (their first _fold_ext lifts them to Ext4), ext/eq as Ext4."""
        from .ext4_dev import ext_from_device

        arr = ext_from_device(planes)
        out: Dict[str, object] = {}
        for i, name in enumerate(self.base_names):
            out[name] = arr[i]
        for j, name in enumerate(self.ext_names):
            out[name] = Ext4(arr[B + 4 * j : B + 4 * j + 4])
        out["__eq__"] = Ext4(arr[B + 4 * E : B + 4 * E + 4])
        return out

    def _combined_host_sum(self, at, alphas, p: int) -> Ext4:
        c_vals = self.combiner(at, alphas, p)
        return (at["__eq__"] * c_vals).sum()
