"""v2 constraint set: real polynomial constraints for the zerocheck.

The v1 pipeline's constraint sumcheck is a structural placeholder
(reference prover.zig:267-288); v2 implements the "complete
implementation" the reference's comments describe, scoped to constraints
expressible over the committed columns plus two auxiliary columns:

    c1: x0(x)                                  = 0   (x0 hardwired zero)
    c2: is_read(x) * (1 - is_read(x))          = 0   (booleanity)
    c3: seq(x) * (1 - seq(x))                  = 0   (booleanity)
    c4: seq(x) * (next_pc(x) - pc(x) - 4)      = 0   (sequential PC step)
    c5: g1(x) * fp1(x) - sel1(x)               = 0   (logUp inverse, LHS)
    c6: g2(x) * fp2(x) - sel2(x)               = 0   (logUp inverse, RHS)

``seq`` marks steps whose instruction always advances pc by 4 (everything
except BRANCH/JAL/JALR/SYSTEM); ``next_pc`` is the recorded next program
counter.  Both are auxiliary committed columns (padding: next_pc repeats
the last value like pc, seq pads with 0 so c3/c4 hold on padding).

c5/c6 are the PC-CHAIN SHIFT ARGUMENT (the reference leaves pc chaining
entirely unconstrained; this closes our ROADMAP #2): with

    fp1(x) = tau - beta*(idx(x)+1) - next_pc(x)
    fp2(y) = tau - beta*idx(y)     - pc(y)
    sel1   = 1[idx <= n-2],   sel2 = 1[1 <= idx <= n-1]      (n = num_steps)

the zerocheck forces g1 = sel1/fp1 and g2 = sel2/fp2 pointwise, and the
Ligero sum queries force sum(g1) == sum(g2); by the logUp identity this
means the multisets {(x+1, next_pc(x)) : x <= n-2} and {(y, pc(y)) :
1 <= y <= n-1} coincide w.h.p. over (tau, beta).  Since the index keys are
injective, this is exactly pc(x+1) = next_pc(x) for every consecutive pair
— branches and jumps included.  idx/sel are PUBLIC MLEs of the public step
count (poly/public_mles.py): the verifier evaluates them itself; only g1
and g2 are committed (their own Ligero commitment, made after tau/beta).

C(x) = sum a_j c_j has degree 2; with the eq factor the zerocheck rounds
have degree <= 3 (4 evaluations per round — the same round shape as the
v1 wire format).

Known scope limits (documented, inherited from the v1 commitment scheme):
instruction SEMANTICS remain delegated to the lookup argument (Jolt's
design position); column-eval binding now uses the Ligero PCS
(commitments/ligero.py) in addition to the v1 point-to-index openings.
"""

from __future__ import annotations

from typing import Dict, List

import numpy as np

from ..isa.rv64i import Opcode
from ..poly.public_mles import (
    eq_zero_eval,
    idx_eval,
    idx_table,
    le_indicator_eval,
    le_table,
    np_inv,
)

__all__ = [
    "NUM_V2_CONSTRAINTS",
    "NUM_V2_ALPHAS",
    "V2_DEGREE",
    "build_aux_columns",
    "build_logup_columns",
    "logup_public_tables",
    "make_v2_combiner",
    "make_v2_combiner_scalar",
    "v2_combiner",
    "v2_combiner_scalar",
]

NUM_V2_CONSTRAINTS = 4  # base execution constraints (c1-c4)
NUM_V2_ALPHAS = 6  # c1-c4 + the two logUp inverse constraints
V2_DEGREE = 3  # deg(eq * C) per variable

_NONSEQ_OPCODES = (Opcode.BRANCH, Opcode.JAL, Opcode.JALR, Opcode.SYSTEM)


def build_aux_columns(trace, num_vars: int, p: int) -> Dict[str, np.ndarray]:
    """(seq, next_pc) canonical uint64 columns over the padded domain."""
    n = trace.step_count()
    padded = 1 << num_vars
    native_cols = getattr(trace, "columns", None)

    if native_cols is not None:
        opcodes = native_cols["opcode"]
        next_pcs = native_cols["next_pc"]
    else:
        opcodes = np.fromiter((i.opcode for i in trace.instructions), dtype=np.uint64, count=n)
        next_pcs = np.fromiter(trace.next_pcs, dtype=np.uint64, count=n)

    seq = np.ones(padded, dtype=np.uint64)
    nonseq = np.isin(opcodes, np.array(_NONSEQ_OPCODES, dtype=opcodes.dtype))
    seq[:n] = (~nonseq).astype(np.uint64)
    seq[n:] = 0  # padding: c3, c4 hold trivially

    next_pc = np.zeros(padded, dtype=np.uint64)
    next_pc[:n] = next_pcs % np.uint64(p)
    next_pc[n:] = next_pc[n - 1] if n > 0 else 0  # pad-with-last, like pc

    return {"seq": seq, "next_pc": next_pc}


def v2_columns(witness, aux: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """The named columns the zerocheck runs over.

    When the trace is native-columnar the three witness columns are built
    directly from it (x0 is identically zero, is_read from mem_flag, pc
    with the pad-last rule) — identical to witness.matrix rows 1/42/0 but
    without materializing the full 43-row host matrix."""
    trace = getattr(witness, "_trace", None)
    cols = getattr(trace, "columns", None) if trace is not None else None
    if cols is not None:
        p = np.uint64(witness.F.MODULUS) if hasattr(witness, "F") else None
    if cols is not None and p is not None:
        n = trace.step_count()
        padded = 1 << witness.num_vars
        pc = np.zeros(padded, dtype=np.uint64)
        pc[:n] = cols["pc"] % p
        if padded > n and n > 0:
            pc[n:] = pc[n - 1]
        is_read = np.zeros(padded, dtype=np.uint64)
        is_read[:n] = (cols["mem_flag"] == 1).astype(np.uint64)
        return {
            "x0": np.zeros(padded, dtype=np.uint64),
            "is_read": is_read,
            "pc": pc,
            "seq": aux["seq"],
            "next_pc": aux["next_pc"],
        }
    return {
        "x0": witness.matrix[1],
        "is_read": witness.matrix[42],
        "pc": witness.matrix[0],
        "seq": aux["seq"],
        "next_pc": aux["next_pc"],
    }


def v2_combiner(cols: Dict[str, np.ndarray], alphas: List[int], p: int):
    """Vectorized C(x) over numpy arrays (mod-p after every product)."""
    P = np.uint64(p)
    one = np.uint64(1)
    x0 = cols["x0"]
    is_read = cols["is_read"]
    seq = cols["seq"]
    pc = cols["pc"]
    next_pc = cols["next_pc"]

    c1 = x0
    c2 = is_read * ((one + P - is_read) % P) % P
    c3 = seq * ((one + P - seq) % P) % P
    delta = (next_pc + P + P - pc - np.uint64(4)) % P
    c4 = seq * delta % P

    acc = np.uint64(alphas[0]) * c1 % P
    acc = (acc + np.uint64(alphas[1]) * c2) % P
    acc = (acc + np.uint64(alphas[2]) * c3) % P
    acc = (acc + np.uint64(alphas[3]) * c4) % P
    return acc


def v2_combiner_scalar(col_evals: Dict[str, int], alphas: List[int], p: int) -> int:
    """Scalar C at the terminal point (verifier side)."""
    x0 = col_evals["x0"] % p
    is_read = col_evals["is_read"] % p
    seq = col_evals["seq"] % p
    pc = col_evals["pc"] % p
    next_pc = col_evals["next_pc"] % p

    c1 = x0
    c2 = is_read * ((1 - is_read) % p) % p
    c3 = seq * ((1 - seq) % p) % p
    c4 = seq * ((next_pc - pc - 4) % p) % p
    return (alphas[0] * c1 + alphas[1] * c2 + alphas[2] * c3 + alphas[3] * c4) % p


# ---------------------------------------------------------------------------
# PC-chain logUp (the shift argument)


def logup_public_tables(num_steps: int, num_vars: int, p: int) -> Dict[str, np.ndarray]:
    """Prover-side dense twins of the verifier-computable MLEs.

    Names carry the ``__`` prefix: the zerocheck folds them like any other
    table but never emits terminal evaluations for them (the verifier
    computes idx(r)/sel(r) itself — prover values are never trusted)."""
    sel2 = le_table(num_steps - 1, num_vars)
    if num_steps >= 1:
        sel2[0] = 0  # sel2 = 1[1 <= idx <= n-1]
    return {
        "__idx__": idx_table(num_vars, p),
        "__sel1__": le_table(num_steps - 2, num_vars),
        "__sel2__": sel2,
    }


def build_logup_columns(pc: np.ndarray, next_pc: np.ndarray, num_steps: int,
                        num_vars: int, tau: int, beta: int, p: int):
    """(g1, g2, shared_sum) inverse columns, or None on a zero active
    denominator (caller retries with the next transcript nonce; probability
    ~2n/p per attempt)."""
    P = np.uint64(p)
    pub = logup_public_tables(num_steps, num_vars, p)
    idx = pub["__idx__"]
    sel1 = pub["__sel1__"]
    sel2 = pub["__sel2__"]

    fp1 = (np.uint64(tau) + P + P - np.uint64(beta) * ((idx + np.uint64(1)) % P) % P
           - next_pc % P) % P
    fp2 = (np.uint64(tau) + P + P - np.uint64(beta) * idx % P - pc % P) % P
    if np.any((fp1 == 0) & (sel1 == 1)) or np.any((fp2 == 0) & (sel2 == 1)):
        return None
    g1 = sel1 * np_inv(fp1, p) % P
    g2 = sel2 * np_inv(fp2, p) % P
    # z_vals < p < 2^31: u64 sums exact for any 2^v <= 2^33.
    s1 = int(g1.sum(dtype=np.uint64)) % p
    s2 = int(g2.sum(dtype=np.uint64)) % p
    if s1 != s2:
        raise AssertionError("PC chain broken in honest trace (VM bug?)")
    return g1, g2, s1


def _logup_terms(cols, tau: int, beta: int, p: int):
    """Vectorized c5, c6 at one evaluation point (folded tables)."""
    P = np.uint64(p)
    idx = cols["__idx__"]
    one = np.uint64(1)
    fp1 = (np.uint64(tau) + P + P - np.uint64(beta) * ((idx + one) % P) % P
           - cols["next_pc"] % P) % P
    fp2 = (np.uint64(tau) + P + P - np.uint64(beta) * idx % P - cols["pc"] % P) % P
    c5 = (cols["g1"] * fp1 + P - cols["__sel1__"]) % P
    c6 = (cols["g2"] * fp2 + P - cols["__sel2__"]) % P
    return c5, c6


def make_v2_combiner(tau: int, beta: int):
    """Full 6-constraint vectorized combiner (prover side)."""

    def combiner(cols: Dict[str, np.ndarray], alphas: List[int], p: int):
        P = np.uint64(p)
        acc = v2_combiner(cols, alphas, p)
        c5, c6 = _logup_terms(cols, tau, beta, p)
        acc = (acc + np.uint64(alphas[4]) * c5) % P
        acc = (acc + np.uint64(alphas[5]) * c6) % P
        return acc

    return combiner


def make_v2_combiner_scalar(num_steps: int, num_vars: int, tau: int, beta: int,
                            final_point: List[int]):
    """Full 6-constraint scalar combiner (verifier side).

    idx/sel1/sel2 at the terminal point are computed from PUBLIC data
    (num_steps) via their closed-form MLEs — never from the proof."""
    def combiner_scalar(col_evals: Dict[str, int], alphas: List[int], p: int) -> int:
        acc = v2_combiner_scalar(col_evals, alphas, p)
        idx_r = idx_eval(num_vars, final_point, p)
        sel1_r = le_indicator_eval(num_steps - 2, num_vars, final_point, p)
        sel2_r = (le_indicator_eval(num_steps - 1, num_vars, final_point, p)
                  - eq_zero_eval(final_point, p)) % p
        fp1 = (tau - beta * ((idx_r + 1) % p) - col_evals["next_pc"]) % p
        fp2 = (tau - beta * idx_r - col_evals["pc"]) % p
        c5 = (col_evals["g1"] * fp1 - sel1_r) % p
        c6 = (col_evals["g2"] * fp2 - sel2_r) % p
        return (acc + alphas[4] * c5 + alphas[5] * c6) % p

    return combiner_scalar
