"""End-to-end integration suite — port of
/root/reference/tests/integration_tests.zig (10 tests, documented in the
reference's tests/README.md): prove -> serialize -> verify plus the security
properties (program-hash binding, Merkle-root and opening-claim tamper
rejection — Jolt PR #981 — transcript determinism, size scaling)."""

import time

import pytest

from zigz_tpu.core.field import BabyBear as F
from zigz_tpu.prover.prover import Prover
from zigz_tpu.prover.proof import VerificationResult
from zigz_tpu.prover.serialization import BinarySerializer
from zigz_tpu.verifier.verifier import ProgramHashMismatch, Verifier

ENTRY = 0x1000


def nop_program(n: int) -> bytes:
    return bytes([0x13, 0x00, 0x00, 0x00] * n)  # ADDI x0, x0, 0


def add_program() -> bytes:
    return bytes([
        0x93, 0x00, 0x50, 0x00,  # ADDI x1, x0, 5
        0x13, 0x01, 0xA0, 0x00,  # ADDI x2, x0, 10
        0xB3, 0x01, 0x20, 0x00,  # ADD x3, x1, x2
        0x13, 0x00, 0x00, 0x00,  # NOP
    ])


def prove(program: bytes, **kw):
    return Prover(F, seed=0).prove(program, ENTRY, None, 1 << 20, None, None, **kw)


# Test 1: basic end-to-end.
def test_basic_end_to_end():
    program = add_program()
    proof = prove(program)
    # The reference's comment says x3 = 15, but its bytes encode
    # ADD x3, x0, x2 (rs1=0), so x3 == 10; we match the bytes.
    assert proof.public_io.final_regs[3] == 10
    assert len(proof.witness_commitments) == 43
    result = Verifier(F).verify(proof, program)
    assert result == VerificationResult.Accept


# Test 2: serialization roundtrip.
def test_serialization_roundtrip():
    program = add_program()
    proof = prove(program)
    ser = BinarySerializer(F)
    data = ser.serialize(proof)
    restored = ser.deserialize(data)
    assert Verifier(F).verify(restored, program) == VerificationResult.Accept
    # Byte-stability: re-serializing gives identical bytes.
    assert ser.serialize(restored) == data


# Test 3: wrong program rejected (ProgramHashMismatch).
def test_wrong_program_rejected():
    program = add_program()
    proof = prove(program)
    wrong = nop_program(4)
    with pytest.raises(ProgramHashMismatch):
        Verifier(F).verify(proof, wrong)


# Test 4: different program sizes.  NOP programs fall off into unmapped
# zeros, which halt via decode failure WITHOUT recording a step, so
# num_steps == size exactly.
def test_program_sizes_exact():
    for size in (4, 8, 16, 32):
        proof = prove(nop_program(size))
        assert proof.metadata.num_steps == size
        assert Verifier(F).verify(proof, nop_program(size)) == VerificationResult.Accept


# Test 5: transcript determinism — identical opening points across provers.
def test_transcript_determinism():
    program = add_program()
    p1 = prove(program)
    p2 = prove(program)
    for c1, c2 in zip(p1.witness_commitments, p2.witness_commitments):
        assert [x.value for x in c1.point] == [x.value for x in c2.point]
        assert c1.value.eql(c2.value)
        assert c1.commitment == c2.commitment
    # And the full proof bytes are identical.
    ser = BinarySerializer(F)
    assert ser.serialize(p1) == ser.serialize(p2)


# Test 6: tampered Merkle root rejected.
def test_tampered_commitment_rejected():
    program = add_program()
    proof = prove(program)
    tampered = bytearray(proof.witness_commitments[0].commitment)
    tampered[0] ^= 0xFF
    proof.witness_commitments[0].commitment = bytes(tampered)
    assert Verifier(F).verify(proof, program) == VerificationResult.RejectInvalidCommitment


# Test 7: tampered opening claim rejected (Jolt PR #981).
def test_tampered_opening_claim_rejected():
    program = add_program()
    proof = prove(program)
    wc = proof.witness_commitments[0]
    wc.value = wc.value.add(F.one())
    assert Verifier(F).verify(proof, program) == VerificationResult.RejectInvalidCommitment


# Test 8: public-input binding — different entry PC gives different points.
def test_public_input_binding():
    program = add_program()
    p1 = Prover(F, seed=0).prove(program, 0x1000, None, 1 << 20, None, None)
    p2 = Prover(F, seed=0).prove(program, 0x2000, None, 1 << 20, None, None)
    pts1 = [x.value for c in p1.witness_commitments for x in c.point]
    pts2 = [x.value for c in p2.witness_commitments for x in c.point]
    assert pts1 != pts2


# Test 9: proof size scales sublinearly (ratio < 2 per doubling).
def test_proof_size_scaling():
    ser = BinarySerializer(F)
    sizes = {}
    for n in (8, 16, 32, 64):
        sizes[n] = len(ser.serialize(prove(nop_program(n))))
    for a, b in ((8, 16), (16, 32), (32, 64)):
        ratio = sizes[b] / sizes[a]
        assert ratio < 2.0, f"{a}->{b}: {ratio}"


# Test 10: prove/verify timing sanity — verify faster than prove.
def test_timing_sanity():
    program = nop_program(64)
    t0 = time.perf_counter()
    proof = prove(program)
    prove_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    assert Verifier(F).verify(proof, program) == VerificationResult.Accept
    verify_s = time.perf_counter() - t0
    assert verify_s < prove_s


# Extra: initial regs bind to the transcript and land in PublicIO.
def test_initial_regs_binding():
    program = add_program()
    regs = [0] * 32
    regs[5] = 123
    proof = Prover(F, seed=0).prove(program, ENTRY, regs, 1 << 20, None, None)
    assert proof.public_io.initial_regs == regs
    assert Verifier(F).verify(proof, program) == VerificationResult.Accept
    base = Prover(F, seed=0).prove(program, ENTRY, None, 1 << 20, None, None)
    pts1 = [x.value for c in proof.witness_commitments for x in c.point]
    pts2 = [x.value for c in base.witness_commitments for x in c.point]
    assert pts1 != pts2


# Extra: outputs tape round-trips through serialization.
def test_outputs_tape_roundtrip():
    program = bytes([
        0x93, 0x08, 0x10, 0x00,  # ADDI x17, x0, 1 (ECALL_COMMIT)
        0x13, 0x05, 0x90, 0x02,  # ADDI x10, x0, 41
        0x73, 0x00, 0x00, 0x00,  # ECALL
        0x73, 0x00, 0x10, 0x00,  # EBREAK
    ])
    proof = prove(program)
    assert proof.public_io.outputs == [41]
    ser = BinarySerializer(F)
    restored = ser.deserialize(ser.serialize(proof))
    assert restored.public_io.outputs == [41]
    assert Verifier(F).verify(restored, program) == VerificationResult.Accept


# Extra: streaming serialization is byte-identical to the in-memory path
# (ROADMAP: chunked writes for the O(num_steps) v1 wire format) and the
# mmap-backed reader round-trips it.
def test_streaming_serialization(tmp_path):
    import io

    ser = BinarySerializer(F)
    for kwargs in ({}, {"protocol_version": 2}):
        program = nop_program(700)  # odd size: exercises slice boundaries
        proof = Prover(F, seed=0, **kwargs).prove(
            program, ENTRY, None, 1 << 20, None, None
        )
        data = ser.serialize(proof)

        sink = io.BytesIO()
        n = ser.serialize_to(proof, sink)
        assert n == len(data)
        assert sink.getvalue() == data

        path = tmp_path / f"proof_v{proof.metadata.version}.bin"
        with open(path, "wb") as f:
            assert ser.serialize_to(proof, f) == len(data)
        restored = ser.deserialize_path(str(path))
        assert ser.serialize(restored) == data
        assert Verifier(F).verify(restored, program) == VerificationResult.Accept


# Extra: a tiny writer chunk still produces identical bytes (flush
# boundaries fall inside individual records).
def test_streaming_small_chunks():
    import io

    from zigz_tpu.prover.serialization import _Writer

    proof = prove(nop_program(33))
    ser = BinarySerializer(F)
    data = ser.serialize(proof)
    sink = io.BytesIO()
    w = _Writer(sink=sink, chunk=7)
    ser._write_all(w, proof)
    assert w.finish() == len(data)
    assert sink.getvalue() == data
