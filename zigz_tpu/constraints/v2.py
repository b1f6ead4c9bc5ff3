"""v2 constraint set: real polynomial constraints for the zerocheck.

The v1 pipeline's constraint sumcheck is a structural placeholder
(reference prover.zig:267-288); v2 implements the "complete
implementation" the reference's comments describe, scoped to constraints
expressible over the committed columns plus two auxiliary columns:

    c1: x0(x)                                  = 0   (x0 hardwired zero)
    c2: is_read(x) * (1 - is_read(x))          = 0   (booleanity)
    c3: seq(x) * (1 - seq(x))                  = 0   (booleanity)
    c4: seq(x) * (next_pc(x) - pc(x) - 4)      = 0   (sequential PC step)

``seq`` marks steps whose instruction always advances pc by 4 (everything
except BRANCH/JAL/JALR/SYSTEM); ``next_pc`` is the recorded next program
counter.  Both are auxiliary committed columns (padding: next_pc repeats
the last value like pc, seq pads with 0 so c3/c4 hold on padding).

C(x) = a1 c1 + a2 c2 + a3 c3 + a4 c4 has degree 2; with the eq factor the
zerocheck rounds have degree <= 3 (4 evaluations per round — the same
round shape as the v1 wire format).

Known scope limits (documented, inherited from the v1 commitment scheme):
instruction SEMANTICS remain delegated to the lookup argument (Jolt's
design position), the pc(x+1)=next_pc(x) chain needs a shift argument
(future work), and column-eval binding to the Merkle roots uses the v1
point-to-index openings.
"""

from __future__ import annotations

from typing import Dict, List

import numpy as np

from ..isa.rv64i import Opcode

__all__ = [
    "NUM_V2_CONSTRAINTS",
    "V2_DEGREE",
    "build_aux_columns",
    "v2_combiner",
    "v2_combiner_scalar",
]

NUM_V2_CONSTRAINTS = 4
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
