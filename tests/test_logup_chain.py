"""PC-chain shift argument (constraints/v2.py c5/c6 + Ligero sum claims).

The reference leaves pc chaining across branches/jumps entirely
unconstrained (its constraint system is metadata, builder.zig:77-149); the
v2 logUp argument proves pc(x+1) = next_pc(x) for every consecutive pair.
These tests check the public-MLE closed forms against brute force and that
a forged branch target is rejected end-to-end — both by the honest prover
(assertion) and by the verifier when a malicious prover bypasses it."""

import struct

import numpy as np
import pytest

from zigz_tpu.core.field import BabyBear as F
from zigz_tpu.poly.public_mles import (
    eq_zero_eval,
    idx_eval,
    idx_table,
    le_indicator_eval,
    le_table,
    np_inv,
)
from zigz_tpu.proofs.zerocheck import _eq_table
from zigz_tpu.prover.prover import Prover
from zigz_tpu.prover.proof import VerificationResult
from zigz_tpu.prover.serialization import BinarySerializer
from zigz_tpu.verifier.verifier import Verifier

P = F.MODULUS
rng = np.random.default_rng(31)


# -- public MLE closed forms -------------------------------------------------

def _brute_mle_eval(table, rs):
    """sum_x eq(rs, x) * table[x] — the defining property of the MLE."""
    eq = _eq_table(list(rs), P)
    return int((eq * (table % np.uint64(P)) % np.uint64(P)).sum(dtype=np.uint64) % np.uint64(P))


@pytest.mark.parametrize("v", [1, 3, 5])
def test_idx_eval_matches_brute_force(v):
    rs = [int(x) for x in rng.integers(0, P, size=v)]
    assert idx_eval(v, rs, P) == _brute_mle_eval(idx_table(v, P), rs)


@pytest.mark.parametrize("v,c", [(3, -1), (3, 0), (3, 3), (3, 6), (3, 7), (5, 17), (5, 31)])
def test_le_indicator_matches_brute_force(v, c):
    rs = [int(x) for x in rng.integers(0, P, size=v)]
    assert le_indicator_eval(c, v, rs, P) == _brute_mle_eval(le_table(c, v), rs)


def test_eq_zero_matches_brute_force():
    v = 4
    rs = [int(x) for x in rng.integers(0, P, size=v)]
    table = np.zeros(1 << v, dtype=np.uint64)
    table[0] = 1
    assert eq_zero_eval(rs, P) == _brute_mle_eval(table, rs)


def test_np_inv():
    vals = rng.integers(1, P, size=100, dtype=np.uint64)
    inv = np_inv(vals, P)
    assert np.all(vals * inv % np.uint64(P) == 1)
    assert np_inv(np.array([0], dtype=np.uint64), P)[0] == 0


# -- end-to-end forged-branch rejection -------------------------------------

def _addi(rd, rs1, imm):
    return (imm & 0xFFF) << 20 | rs1 << 15 | rd << 7 | 0x13


def _beq(rs1, rs2, off):
    imm = off & 0x1FFF
    return (((imm >> 12) & 1) << 31 | ((imm >> 5) & 0x3F) << 25 | rs2 << 20
            | rs1 << 15 | ((imm >> 1) & 0xF) << 8 | ((imm >> 11) & 1) << 7 | 0x63)


def _branch_program():
    """ADDI; BEQ x0,x0,+8 (always taken, skips one ADDI); ADDI; ADDI; EBREAK."""
    return struct.pack(
        "<6I",
        _addi(1, 0, 3),
        _beq(0, 0, 8),
        _addi(2, 0, 99),  # skipped
        _addi(3, 0, 7),
        _addi(4, 0, 8),
        0x00100073,
    )


def _prove(program, version=2):
    return Prover(F, seed=0, protocol_version=version).prove(
        program, 0x1000, None, 1 << 10, None, None
    )


@pytest.mark.parametrize("version", [2, 3])
def test_branch_program_accepts(version):
    program = _branch_program()
    proof = _prove(program, version)
    # Branch taken: x2 never written.
    assert proof.public_io.final_regs[2] == 0
    assert proof.public_io.final_regs[3] == 7
    assert Verifier(F).verify(proof, program) == VerificationResult.Accept
    ser = BinarySerializer(F)
    restored = ser.deserialize(ser.serialize(proof))
    assert Verifier(F).verify(restored, program) == VerificationResult.Accept


def _forge_branch_target(monkeypatch):
    """Patch build_aux_columns so the BEQ step (index 1) claims the
    fall-through target 0x1008 while the trace really continued at 0x100c
    — the forged-branch-target attack (seq=0 there, so c4 cannot catch
    it; only the PC-chain multiset does)."""
    import zigz_tpu.constraints.v2 as v2mod

    honest = v2mod.build_aux_columns

    def forged(trace, num_vars, p):
        aux = honest(trace, num_vars, p)
        assert aux["next_pc"][1] == 0x100C  # branch really taken
        aux["next_pc"] = aux["next_pc"].copy()
        aux["next_pc"][1] = 0x1008
        return aux

    monkeypatch.setattr(v2mod, "build_aux_columns", forged)


def test_forged_branch_target_caught_by_honest_prover(monkeypatch):
    _forge_branch_target(monkeypatch)
    with pytest.raises(AssertionError, match="PC chain broken"):
        _prove(_branch_program())


def test_forged_branch_target_rejected_by_verifier(monkeypatch):
    """Malicious prover: bypass the prover-side sum assertion and ship the
    LHS sum as the shared claim — the Ligero batched sum claim must fail."""
    import zigz_tpu.constraints.v2 as v2mod

    _forge_branch_target(monkeypatch)

    def malicious_logup(pc, next_pc, num_steps, num_vars, tau, beta, p):
        pub = v2mod.logup_public_tables(num_steps, num_vars, p)
        idx, sel1, sel2 = pub["__idx__"], pub["__sel1__"], pub["__sel2__"]
        fp1 = tau - beta * ((idx + np.uint64(1)) % np.uint64(p)) - next_pc
        fp2 = tau - beta * idx - pc
        g1 = sel1 * fp1.inv()
        g2 = sel2 * fp2.inv()
        return g1, g2, g1.sum()  # lie: claim LHS sum

    monkeypatch.setattr(v2mod, "build_logup_columns", malicious_logup)
    program = _branch_program()
    proof = _prove(program)
    # Round 3: the bytecode argument's control-flow chain ALSO constrains
    # next_pc and fires first in the unified ordering; either rejection
    # closes the forgery.
    assert Verifier(F).verify(proof, program) in (
        VerificationResult.RejectInvalidBytecode,
        VerificationResult.RejectInvalidCommitment,
    )


def test_tampered_logup_sum_rejected():
    program = _branch_program()
    proof = _prove(program)
    proof.v2.logup_sum = (proof.v2.logup_sum + 1) % P
    assert Verifier(F).verify(proof, program) != VerificationResult.Accept


def test_tampered_g_eval_rejected():
    program = _branch_program()
    proof = _prove(program)
    proof.v2.column_evals["g1#0"] = (proof.v2.column_evals["g1#0"] + 1) % P
    assert Verifier(F).verify(proof, program) != VerificationResult.Accept


def test_tampered_logup_root_rejected():
    """The g1/g2 advice columns live in the unified advice commitment."""
    program = _branch_program()
    proof = _prove(program)
    proof.v2.unified.advice_root = bytes(32)
    assert Verifier(F).verify(proof, program) != VerificationResult.Accept


def test_single_step_program():
    """num_vars == 0: the chain argument degenerates (sel windows empty)."""
    program = struct.pack("<I", 0x00100073)  # lone EBREAK
    proof = _prove(program)
    assert proof.public_io.num_steps == 1
    assert Verifier(F).verify(proof, program) == VerificationResult.Accept
