"""Protocol v4 (unified Ligero witness PCS): end-to-end accept,
roundtrip, determinism, and tamper rejection.

v4 = v2 with the 43 witness MLEs under ONE Ligero commitment opened at
the zerocheck terminal point, replacing the v1-style Merkle forest +
point-to-index openings entirely (the reference's known gap at
polynomial_commit.zig:178-183, closed for every witness column)."""

import copy

import pytest

from zigz_tpu.core.field import BabyBear as F
from zigz_tpu.prover.prover import Prover
from zigz_tpu.prover.proof import VerificationResult
from zigz_tpu.prover.serialization import BinarySerializer
from zigz_tpu.verifier.verifier import Verifier


def _program(n_adds=60):
    body = bytes([0x93, 0x00, 0x30, 0x00, 0x13, 0x01, 0x40, 0x00])
    body += bytes([0xB3, 0x81, 0x20, 0x00]) * n_adds
    return body + bytes([0x73, 0x00, 0x10, 0x00])


def _prove(program, **kw):
    return Prover(F, seed=0, protocol_version=4, **kw).prove(
        program, 0x1000, None, 1 << 10, None, None
    )


@pytest.fixture(scope="module")
def proof_and_program():
    program = _program()
    return _prove(program), program


def test_v4_accepts_and_roundtrips(proof_and_program):
    proof, program = proof_and_program
    assert proof.metadata.version == 4
    assert proof.witness_commitments == []  # no per-column Merkle forest
    assert Verifier(F).verify(proof, program) == VerificationResult.Accept
    ser = BinarySerializer(F)
    data = ser.serialize(proof)
    restored = ser.deserialize(data)
    assert restored.metadata.version == 4
    assert Verifier(F).verify(restored, program) == VerificationResult.Accept
    assert ser.serialize(restored) == data


def test_v4_deterministic(proof_and_program):
    proof, program = proof_and_program
    ser = BinarySerializer(F)
    again = _prove(program)
    assert ser.serialize(again) == ser.serialize(proof)


def test_v4_all_43_columns_bound(proof_and_program):
    from zigz_tpu.constraints.witness import WITNESS_POLY_NAMES

    proof, _ = proof_and_program
    assert set(proof.v2.witness_evals) == set(WITNESS_POLY_NAMES)
    assert len(proof.v2.unified.data_root) == 32


def test_v4_tampered_witness_eval_rejected(proof_and_program):
    """Forging ANY witness column eval (here a register column no other
    v2 sub-argument opens at this point) must be rejected by the Ligero
    binding — the exact gap v1 point-to-index openings left."""
    proof, program = proof_and_program
    t = copy.deepcopy(proof)
    t.v2.witness_evals["x5"] = (t.v2.witness_evals["x5"] + 1) % F.MODULUS
    assert Verifier(F).verify(t, program) != VerificationResult.Accept


def test_v4_tampered_witness_root_rejected(proof_and_program):
    proof, program = proof_and_program
    t = copy.deepcopy(proof)
    t.v2.unified.data_root = bytes(32)
    assert Verifier(F).verify(t, program) != VerificationResult.Accept


def test_v4_cross_commitment_consistency_enforced(proof_and_program):
    """The witness PCS evals shared with the small zerocheck commitment
    (pc/x0/mem_is_read) must agree with column_evals; forging both sides
    coherently still fails the zerocheck or the small-PCS binding."""
    proof, program = proof_and_program
    t = copy.deepcopy(proof)
    t.v2.witness_evals["pc"] = (t.v2.witness_evals["pc"] + 1) % F.MODULUS
    assert Verifier(F).verify(t, program) != VerificationResult.Accept
    t2 = copy.deepcopy(proof)
    t2.v2.witness_evals["mem_is_read"] = (
        t2.v2.witness_evals["mem_is_read"] + 1
    ) % F.MODULUS
    assert Verifier(F).verify(t2, program) != VerificationResult.Accept


def test_v4_missing_section_rejected(proof_and_program):
    proof, program = proof_and_program
    t = copy.deepcopy(proof)
    t.v2.witness_evals = None
    assert Verifier(F).verify(t, program) != VerificationResult.Accept


def test_v4_wrong_trace_rejected():
    """A v4 proof for one program fails against another (hash binding),
    and a forged witness matrix cannot satisfy the committed evals."""
    program = _program()
    other = _program(n_adds=61)
    proof = _prove(program)
    from zigz_tpu.verifier.verifier import ProgramHashMismatch

    with pytest.raises(ProgramHashMismatch):
        Verifier(F).verify(proof, other)


def test_v4_guest_with_io():
    from zigz_tpu import elf as elf_mod
    from zigz_tpu.guest.programs import fibonacci_guest

    elf = fibonacci_guest()
    loaded = elf_mod.load(elf)
    prover = Prover(F, seed=0, protocol_version=4)
    proof = prover.prove(elf, loaded.entry_pc, None, 1 << 16, loaded.segments, [10])
    assert proof.public_io.outputs == [55, 89]
    assert Verifier(F).verify(proof, elf) == VerificationResult.Accept


def test_v4_requires_babybear():
    from zigz_tpu.core.field import Goldilocks

    with pytest.raises(ValueError, match="BabyBear"):
        Prover(Goldilocks, protocol_version=4)
