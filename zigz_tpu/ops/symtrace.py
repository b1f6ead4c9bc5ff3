"""Symbolic tracing of zerocheck combiners onto TPU Montgomery lanes.

Every logUp/constraint argument in the package (constraints/bytecode.py,
regcheck.py, memcheck.py, lookups/validity.py, constraints/linkage.py)
expresses its constraint combination as a *combiner*: a pure function over a
dict of equally-shaped canonical uint64 numpy arrays, built exclusively from
mod-p ring operations (+, -, * and explicit ``% p`` reductions).  The host
ZerocheckProver sweeps these combiners ``degree+1`` times per round — the
dominant v2 prover cost at scale.

Instead of hand-porting each combiner to a device kernel (the approach of
the removed round-2 fixed v2 device combiner), this module runs the
combiner ONCE with symbolic operands and records the expression DAG, then
compiles the DAG to BabyBear Montgomery uint32 lanes (ops/babybear).  The
same Python definition therefore serves as both the host reference and the
TPU kernel — bit-equality is structural, not re-implemented.

Two properties make this sound:

* Combiners only need congruence mod p: the zerocheck prover reduces every
  emitted value, so evaluating the DAG with reduce-after-every-op Montgomery
  arithmetic yields the same canonical integers as numpy's exact-uint64
  delayed-reduction schedule.
* Combiner *control flow* never depends on challenge values (loops run over
  static gadget structure), so re-tracing with fresh Fiat-Shamir challenges
  yields the same DAG structure with different constants.  Every constant
  occurrence is therefore interned as a PARAMETER slot — the compiled XLA
  program is reused across proofs, only the (K,) constant vector changes.
  (For the same reason no value-based simplification is performed: a
  challenge that happens to equal 0 or 1 must not change the program.)

The only non-ring numpy API combiners use is ``np.zeros_like`` (accumulator
seeds); it is intercepted via __array_function__ as a structural zero.
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import numpy as np

__all__ = ["TraceError", "trace_combiner", "compile_device", "CombinerTrace"]

P = 2013265921  # BabyBear

# Node opcodes.
_COL, _CONST, _ZERO, _ADD, _SUB, _MUL = range(6)


class TraceError(Exception):
    """The combiner used an operation outside the traced ring algebra."""


class _Trace:
    __slots__ = ("nodes", "cse", "col_names", "consts")

    def __init__(self):
        self.nodes: List[tuple] = []
        self.cse: Dict[tuple, int] = {}
        self.col_names: List[str] = []
        self.consts: List[int] = []

    def node(self, op: int, a, b=None) -> int:
        key = (op, a, b)
        if op in (_ADD, _SUB, _MUL):
            # Structural CSE (value-independent: operands are node ids).
            hit = self.cse.get(key)
            if hit is not None:
                return hit
        self.nodes.append(key)
        nid = len(self.nodes) - 1
        if op in (_ADD, _SUB, _MUL):
            self.cse[key] = nid
        return nid

    def col(self, name: str) -> int:
        if name not in self.col_names:
            self.col_names.append(name)
            return self.node(_COL, name)
        # One COL node per name: reuse via CSE-like lookup.
        for i, (op, a, _b) in enumerate(self.nodes):
            if op == _COL and a == name:
                return i
        raise AssertionError("unreachable")

    def const(self, value) -> int:
        """Fresh parameter slot per constant OCCURRENCE (no value dedup —
        structure must not depend on challenge values)."""
        self.consts.append(int(value) % P)
        return self.node(_CONST, len(self.consts) - 1)


_INT_TYPES = (int, np.integer)


class SymExpr:
    """Operand wrapper recording ring operations into a _Trace."""

    __slots__ = ("t", "i")
    # Win the numpy binary-op dispatch so np.uint64(c) * sym routes here.
    __array_priority__ = 1000

    def __init__(self, t: _Trace, i: int):
        self.t = t
        self.i = i

    # -- helpers -----------------------------------------------------------
    def _coerce(self, other) -> int:
        if isinstance(other, SymExpr):
            if other.t is not self.t:
                raise TraceError("mixed traces")
            return other.i
        if isinstance(other, _INT_TYPES):
            return self.t.const(other)
        raise TraceError(f"unsupported operand type {type(other)!r}")

    def _bin(self, op: int, other, reflected: bool = False):
        j = self._coerce(other)
        a, b = (j, self.i) if reflected else (self.i, j)
        return SymExpr(self.t, self.t.node(op, a, b))

    # -- ring operators ------------------------------------------------------
    def __add__(self, other):
        return self._bin(_ADD, other)

    def __radd__(self, other):
        return self._bin(_ADD, other, reflected=True)

    def __sub__(self, other):
        return self._bin(_SUB, other)

    def __rsub__(self, other):
        return self._bin(_SUB, other, reflected=True)

    def __mul__(self, other):
        return self._bin(_MUL, other)

    def __rmul__(self, other):
        return self._bin(_MUL, other, reflected=True)

    def __mod__(self, modulus):
        if int(modulus) != P:
            raise TraceError(f"reduction by {modulus} != BabyBear p")
        return self  # every traced op already reduces mod p

    def __neg__(self):
        return SymExpr(self.t, self.t.node(_SUB, self.t.const(0), self.i))

    def copy(self):
        return self

    # -- numpy protocol ------------------------------------------------------
    def __array_ufunc__(self, ufunc, method, *inputs, **kwargs):
        if method != "__call__" or kwargs.get("out") is not None:
            raise TraceError(f"unsupported ufunc usage {ufunc.__name__}.{method}")
        if ufunc is np.add:
            a, b = inputs
            return a + b if isinstance(a, SymExpr) else self.__radd__(a)
        if ufunc is np.subtract:
            a, b = inputs
            return a - b if isinstance(a, SymExpr) else self.__rsub__(a)
        if ufunc is np.multiply:
            a, b = inputs
            return a * b if isinstance(a, SymExpr) else self.__rmul__(a)
        if ufunc in (np.remainder, np.mod):
            a, b = inputs
            if isinstance(b, SymExpr):
                raise TraceError("symbolic modulus")
            return a.__mod__(b)
        if ufunc is np.positive:
            return inputs[0]
        if ufunc is np.negative:
            return -inputs[0]
        raise TraceError(f"unsupported ufunc {ufunc.__name__}")

    def __array_function__(self, func, types, args, kwargs):
        if func is np.zeros_like:
            return SymExpr(self.t, self.t.node(_ZERO, None))
        if func is np.ones_like:
            return SymExpr(self.t, self.t.const(1))
        if func is np.full_like:
            fill = args[1]
            if isinstance(fill, SymExpr):
                raise TraceError("np.full_like with a symbolic fill value")
            return SymExpr(self.t, self.t.const(fill))
        raise TraceError(f"unsupported numpy function {func.__name__}")

    # Anything value-dependent must fail loudly.
    def __bool__(self):
        raise TraceError("combiner control flow depends on a symbolic value")

    def __int__(self):
        raise TraceError("symbolic value cannot be converted to int")

    def __index__(self):
        raise TraceError("symbolic value cannot be used as an index")


class _TraceDict(dict):
    """cols mapping handed to the combiner: materializes a COL per name."""

    def __init__(self, trace: _Trace, names):
        super().__init__()
        self._trace = trace
        for name in names:
            super().__setitem__(name, SymExpr(trace, trace.col(name)))


class CombinerTrace:
    """Result of tracing: structural signature + per-proof constant vector."""

    __slots__ = ("nodes", "out", "col_names", "consts", "signature")

    def __init__(self, nodes, out, col_names, consts):
        self.nodes = nodes
        self.out = out
        self.col_names = col_names
        self.consts = consts  # canonical ints, proof-specific
        self.signature = (tuple(nodes), out, tuple(col_names))


def trace_combiner(combiner, column_names, alphas: List[int], p: int) -> CombinerTrace:
    """Run ``combiner(cols, alphas, p)`` symbolically.

    ``column_names`` is the full set of available columns; only those the
    combiner actually reads appear in the trace (the zerocheck still folds
    unread columns for its terminal evaluations).  ``alphas`` are passed
    through as plain ints — their uses are captured as constant slots like
    every other challenge-derived value.
    """
    if p != P:
        raise TraceError("symbolic tracing is BabyBear-only")
    t = _Trace()
    cols = _TraceDict(t, column_names)
    out = combiner(cols, list(alphas), p)
    if not isinstance(out, SymExpr):
        raise TraceError(f"combiner returned {type(out)!r}, not a traced value")
    return CombinerTrace(t.nodes, out.i, t.col_names, t.consts)


# ---------------------------------------------------------------------------
# Device compilation
# ---------------------------------------------------------------------------

_COMPILED: Dict[tuple, object] = {}


def compile_device(signature: tuple, row_of: Dict[str, int]):
    """-> fn(stacked_m (C, n) mont uint32, consts_m (K,) mont uint32) ->
    (n,) mont uint32 evaluating the DAG lane-wise.

    Cached per (signature, row mapping); the returned callable is jitted, so
    XLA fuses the whole elementwise DAG into a handful of kernels and the
    compilation is reused across proofs (constants are runtime inputs).
    """
    key = (signature, tuple(sorted(row_of.items())))
    fn = _COMPILED.get(key)
    if fn is not None:
        return fn

    import jax
    import jax.numpy as jnp

    from .babybear import add_mod, mont_mul, sub_mod

    nodes, out, _col_names = signature
    rows = [row_of[a] if op == _COL else None for (op, a, _b) in nodes]

    def run(stacked_m, consts_m):
        n = stacked_m.shape[-1]
        vals: List[object] = [None] * len(nodes)
        zero = None
        for i, (op, a, b) in enumerate(nodes):
            if op == _COL:
                vals[i] = stacked_m[rows[i]]
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
        return vals[out]

    fn = jax.jit(run)
    _COMPILED[key] = fn
    return fn
