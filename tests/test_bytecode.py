"""Bytecode fetch+decode argument (constraints/bytecode.py).

The reference never constrains fetch or decode — the witness's
opcode/funct/rs/imm columns are unchecked advice (witness.zig:134-215).
These tests gate our Jolt-style bytecode memory check: every executed
step must run the instruction the PUBLIC program stores at its pc, so a
proof made for program A must not verify against a program B that
differs in any executed instruction.
"""

import numpy as np
import pytest

from zigz_tpu import elf
from zigz_tpu.core.field import BabyBear as F
from zigz_tpu.constraints.bytecode import (
    build_bytecode_table,
    decode_fields,
    step_static_columns,
)
from zigz_tpu.guest.programs import fibonacci_guest
from zigz_tpu.isa import rv64i
from zigz_tpu.prover.prover import Prover
from zigz_tpu.prover.proof import VerificationResult
from zigz_tpu.prover.serialization import BinarySerializer
from zigz_tpu.verifier.verifier import Verifier

P = F.MODULUS


def _nop_add_program():
    # addi x1, x0, 3 ; addi x2, x0, 4 ; 29x add x3, x1, x2 ; ecall
    return bytes([0x93, 0x00, 0x30, 0x00, 0x13, 0x01, 0x40, 0x00]
                 + [0xB3, 0x81, 0x20, 0x00] * 29 + [0x73, 0x00, 0x10, 0x00])


def _prove(program, entry=0x1000, segments=None, tape=None):
    return Prover(F, seed=0, protocol_version=2).prove(
        program, entry, None, 1 << 16, segments, tape
    )


# -- vectorized decoder twin -------------------------------------------------


def test_decode_fields_matches_scalar_decoder():
    """decode_fields is a vectorized twin of isa/rv64i.decode; cross-check
    every decodable word of the fibonacci guest's text segment."""
    loaded = elf.load(fibonacci_guest())
    words = []
    for seg in loaded.segments:
        data = bytes(seg.data)
        for off in range(0, len(data) - 3):
            w = int.from_bytes(data[off:off + 4], "little")
            if w & 0x7F:
                words.append(w)
    words = np.array(words, dtype=np.uint32)
    op, rd, f3, rs1, rs2, f7, imm = decode_fields(words)
    checked = 0
    for i, w in enumerate(words):
        try:
            inst = rv64i.decode(int(w))
        except Exception:
            continue
        assert op[i] == inst.opcode and rd[i] == inst.rd
        assert f3[i] == inst.funct3 and f7[i] == inst.funct7
        assert rs1[i] == inst.rs1 and rs2[i] == inst.rs2
        assert int(imm[i]) == inst.imm & ((1 << 64) - 1)
        checked += 1
    assert checked > 20


def test_table_covers_executed_pcs():
    program = _nop_add_program()
    table = build_bytecode_table(program, 0x1000, None, P)
    pcs = np.arange(0x1000, 0x1000 + len(program), 4, dtype=np.uint64)
    pos = np.searchsorted(table.addrs, pcs)
    assert np.all(table.addrs[pos] == pcs)
    # Aligned rows carry the decode of their word.
    row0 = pos[0]
    assert table.cols["a1"][row0] == 0 and table.cols["wrs"][row0] == 1
    assert table.cols["imm_0"][row0] == 3  # addi x1, x0, 3


# -- end-to-end accept / reject ---------------------------------------------


def test_e2e_accept_with_branches_and_ecalls():
    guest = fibonacci_guest()
    loaded = elf.load(guest)
    proof = _prove(guest, loaded.entry_pc, loaded.segments, [9])
    assert proof.v2.bytecode is not None
    assert Verifier(F).verify(proof, guest) == VerificationResult.Accept


def test_missing_bytecode_rejected():
    program = _nop_add_program()
    proof = _prove(program)
    proof.v2.bytecode = None
    assert (
        Verifier(F).verify(proof, program)
        == VerificationResult.RejectInvalidBytecode
    )


def _claim_program(proof, forged: bytes):
    """Malicious-prover move: claim the proof is for `forged` by setting
    the (prover-controlled) PublicIO hash; the committed trace still ran
    the original program.  The sha256 gate passes — only the bytecode
    argument can catch the mismatch."""
    from hashlib import sha256

    proof.public_io.program_hash = sha256(forged).digest()
    return proof


def test_wrong_program_rejected():
    """A proof whose committed trace ran program A must not verify as a
    proof of program B differing in one executed instruction — here the
    first ADDI's immediate (3 -> 5), which no prior argument observed
    (the word is never loaded as data, only fetched).  The public-IO
    hash swap diverges the transcript, so rejection may surface at any
    layer; what matters is that it is NOT Accept."""
    program = _nop_add_program()
    proof = _prove(program)
    forged = bytearray(program)
    assert forged[2] == 0x30
    forged[2] = 0x50
    _claim_program(proof, bytes(forged))
    assert (
        Verifier(F).verify(proof, bytes(forged)) != VerificationResult.Accept
    )


def test_forged_decoded_immediate_rejected():
    """Isolate the bytecode argument: an otherwise-honest prover commits
    a decode tuple whose immediate limb disagrees with the program at
    one executed step.  The honest prover's self-check trips; bypassing
    it, the fetch logUp (g_sum vs h_sum over diverged fingerprints)
    rejects."""
    program = _nop_add_program()
    prover = Prover(F, seed=0, protocol_version=2)

    def forge(lk, table):
        lk["imm_0"] = lk["imm_0"].copy()
        lk["imm_0"][0] = (int(lk["imm_0"][0]) + 1) % (1 << 16)

    prover._bc_forge_hook = forge
    with pytest.raises(AssertionError, match="fetch multiset mismatch"):
        prover.prove(program, 0x1000, None, 1 << 16, None, None)

    prover = Prover(F, seed=0, protocol_version=2)
    prover._bc_forge_hook = forge
    prover._bc_unsafe = True
    proof = prover.prove(program, 0x1000, None, 1 << 16, None, None)
    assert (
        Verifier(F).verify(proof, program)
        == VerificationResult.RejectInvalidBytecode
    )


def test_forged_table_id_rejected():
    """Claim an executed ADD used the SUB lookup table: the tbl1 slot of
    the committed tuple diverges from the public decode."""
    program = _nop_add_program()
    prover = Prover(F, seed=0, protocol_version=2)

    def forge(lk, table):
        lk["tbl1"] = lk["tbl1"].copy()
        lk["tbl1"][2] = (int(lk["tbl1"][2]) + 1) % P

    prover._bc_forge_hook = forge
    prover._bc_unsafe = True
    proof = prover.prove(program, 0x1000, None, 1 << 16, None, None)
    assert (
        Verifier(F).verify(proof, program)
        == VerificationResult.RejectInvalidBytecode
    )


def test_tampered_decode_eval_rejected():
    program = _nop_add_program()
    proof = _prove(program)
    ser = BinarySerializer(F)
    restored = ser.deserialize(ser.serialize(proof))
    bc = restored.v2.bytecode
    bc.zc.column_evals["tbl1"] = (bc.zc.column_evals["tbl1"] + 1) % P
    assert (
        Verifier(F).verify(restored, program)
        == VerificationResult.RejectInvalidBytecode
    )


def test_tampered_multiset_sum_rejected():
    program = _nop_add_program()
    proof = _prove(program)
    ser = BinarySerializer(F)
    restored = ser.deserialize(ser.serialize(proof))
    restored.v2.bytecode.g_sum = (restored.v2.bytecode.g_sum + 1) % P
    assert (
        Verifier(F).verify(restored, program)
        == VerificationResult.RejectInvalidBytecode
    )


def test_tampered_external_reg_eval_rejected():
    """The bytecode zerocheck consumes regcheck columns (read cells);
    forging the claimed regcheck eval must break either the zerocheck
    linkage or the Ligero binding to the regcheck root."""
    program = _nop_add_program()
    proof = _prove(program)
    ser = BinarySerializer(F)
    restored = ser.deserialize(ser.serialize(proof))
    bc = restored.v2.bytecode
    bc.zc.column_evals["ref_rv1_0"] = (bc.zc.column_evals["ref_rv1_0"] + 1) % P
    assert (
        Verifier(F).verify(restored, program)
        == VerificationResult.RejectInvalidBytecode
    )


# -- output-tape binding ------------------------------------------------------


def _prove_fib():
    guest = fibonacci_guest()
    loaded = elf.load(guest)
    return guest, _prove(guest, loaded.entry_pc, loaded.segments, [8])


def test_forged_public_outputs_rejected():
    """Claiming outputs the trace never committed must not verify."""
    guest, proof = _prove_fib()
    assert proof.public_io.outputs  # fib guest commits two values
    proof.public_io.outputs = list(proof.public_io.outputs)
    proof.public_io.outputs[0] += 1
    assert Verifier(F).verify(proof, guest) != VerificationResult.Accept


def test_extra_public_output_rejected():
    guest, proof = _prove_fib()
    proof.public_io.outputs = list(proof.public_io.outputs) + [12345]
    assert Verifier(F).verify(proof, guest) != VerificationResult.Accept


def test_outputs_on_outputless_program_rejected():
    """A program with no ECALL_COMMIT cannot be claimed to output anything."""
    program = _nop_add_program()
    proof = _prove(program)
    assert not proof.public_io.outputs
    proof.public_io.outputs = [42]
    assert Verifier(F).verify(proof, program) != VerificationResult.Accept


def test_prover_rejects_inconsistent_tape():
    """The honest prover's self-check: trace commits != public outputs."""
    from zigz_tpu.constraints import bytecode as bc_mod

    guest = fibonacci_guest()
    loaded = elf.load(guest)
    prover = Prover(F, seed=0, protocol_version=2)
    old = bc_mod.BytecodeArgument.__init__

    def patched(self, *args, **kwargs):
        kwargs["outputs"] = [999]
        return old(self, *args, **kwargs)

    bc_mod.BytecodeArgument.__init__ = patched
    try:
        with pytest.raises(AssertionError, match="output tape mismatch"):
            prover.prove(guest, loaded.entry_pc, None, 1 << 16,
                         loaded.segments, [8])
    finally:
        bc_mod.BytecodeArgument.__init__ = old


def test_forged_counter_chain_rejected():
    """Skipping a commit-counter increment breaks the index-shift logUp."""
    guest = fibonacci_guest()
    loaded = elf.load(guest)
    prover = Prover(F, seed=0, protocol_version=2)

    def forge(lk, table):
        rows = np.nonzero(lk["c_commit"] == 1)[0]
        lk["cnt"] = lk["cnt"].copy()
        lk["cnt"][int(rows[-1]) + 1 :] = 0  # forget the last commit

    prover._bc_forge_hook = forge
    prover._bc_unsafe = True
    proof = prover.prove(guest, loaded.entry_pc, None, 1 << 16,
                         loaded.segments, [8])
    assert (
        Verifier(F).verify(proof, guest)
        == VerificationResult.RejectInvalidBytecode
    )


def test_tampered_gout_sum_rejected():
    guest, proof = _prove_fib()
    ser = BinarySerializer(F)
    restored = ser.deserialize(ser.serialize(proof))
    restored.v2.bytecode.gout_sum = (restored.v2.bytecode.gout_sum + 1) % P
    assert (
        Verifier(F).verify(restored, guest)
        == VerificationResult.RejectInvalidBytecode
    )


# -- witness linkage (constraints/linkage.py) --------------------------------


def test_substituted_valid_query_rejected():
    """THE linkage property: replace an executed ADD query with a
    DIFFERENT genuine ADD table entry.  The validity argument alone is
    satisfied (it is a real table row); only the step<->query multiset
    linkage can catch that it is not what the trace executed."""
    program = _nop_add_program()
    prover = Prover(F, seed=0, protocol_version=2)

    def forge(tid, cols):
        if tid != 0:
            return
        # row 0: (x, y, z) -> (x+1, y, z+1) stays a valid 64-bit ADD row
        # as long as limb 0 doesn't overflow (values here are tiny).
        cols["x0"] = cols["x0"].copy()
        cols["z0"] = cols["z0"].copy()
        cols["x0"][0] += 1
        cols["z0"][0] += 1

    prover._lv_forge_hook = forge
    with pytest.raises(AssertionError, match="multiset mismatch"):
        prover.prove(program, 0x1000, None, 1 << 16, None, None)

    prover = Prover(F, seed=0, protocol_version=2)
    prover._lv_forge_hook = forge
    prover._lv_unsafe = True
    prover._bc_unsafe = True
    proof = prover.prove(program, 0x1000, None, 1 << 16, None, None)
    assert (
        Verifier(F).verify(proof, program)
        == VerificationResult.RejectInvalidBytecode
    )


def test_forged_step_result_rejected():
    """A step-side result column disagreeing with the linked query (and
    the regcheck write value) must be rejected."""
    program = _nop_add_program()
    prover = Prover(F, seed=0, protocol_version=2)

    def forge(lk, table):
        lk["res_0"] = lk["res_0"].copy()
        lk["res_0"][2] = (int(lk["res_0"][2]) + 1) % (1 << 16)

    prover._bc_forge_hook = forge
    prover._bc_unsafe = True
    proof = prover.prove(program, 0x1000, None, 1 << 16, None, None)
    assert (
        Verifier(F).verify(proof, program)
        == VerificationResult.RejectInvalidBytecode
    )


def test_tampered_link_sum_rejected():
    program = _nop_add_program()
    proof = _prove(program)
    ser = BinarySerializer(F)
    restored = ser.deserialize(ser.serialize(proof))
    assert restored.v2.bytecode.links
    restored.v2.bytecode.links[0].g_sum = (
        restored.v2.bytecode.links[0].g_sum + 1
    ) % P
    assert (
        Verifier(F).verify(restored, program)
        == VerificationResult.RejectInvalidBytecode
    )


def test_missing_link_records_rejected():
    program = _nop_add_program()
    proof = _prove(program)
    assert proof.v2.bytecode.links
    proof.v2.bytecode.links = []
    assert (
        Verifier(F).verify(proof, program)
        == VerificationResult.RejectInvalidBytecode
    )


# -- control flow (branch/JAL targets, link registers, LUI, ECALL/EBREAK) ----


def _control_flow_program():
    from zigz_tpu.guest.asm import Assembler

    a = Assembler()
    a.lui("x1", 0x12345)          # x1 = 0x12345000
    a.auipc("x2", 0)              # x2 = pc (0x1004)
    a.jal("x3", "over")           # x3 = 0x100C
    a.addi("x4", "zero", 99)      # skipped
    a.label("over")
    a.jalr("x5", "x2", 0x14)      # x5 = link; target = 0x1004+0x14 = 0x1018
    a.addi("x6", "zero", 1)       # skipped (jalr lands past it)? target check
    a.label("after")
    a.beq("zero", "zero", "out")  # taken branch
    a.addi("x7", "zero", 7)       # skipped
    a.label("out")
    a.addi("x31", "zero", 5)
    a.ebreak()
    return a.assemble()


def test_control_flow_e2e_accept():
    program = _control_flow_program()
    proof = _prove(program)
    # x3 = return addr of jal (0x100C); x5 = return of jalr
    assert proof.public_io.final_regs[1] == 0x12345000
    assert proof.public_io.final_regs[2] == 0x1004
    assert proof.public_io.final_regs[3] == 0x100C
    assert proof.public_io.final_regs[4] == 0  # jal skipped the addi x4
    assert proof.public_io.final_regs[6] == 0  # jalr skipped the addi x6
    assert Verifier(F).verify(proof, program) == VerificationResult.Accept


def test_auipc_wraparound_accepts():
    """AUIPC with the sign-bit immediate wraps below zero mod 2^64; the
    4-limb adder must stay exact through the wrap."""
    from zigz_tpu.guest.asm import Assembler

    a = Assembler()
    a.auipc("x8", -(1 << 19))  # x8 = (pc - 2^31) mod 2^64 -> high limbs set
    a.addi("x9", "x8", 0)
    a.ebreak()
    program = a.assemble()
    proof = _prove(program)
    assert proof.public_io.final_regs[8] == (0x1000 - (1 << 31)) % (1 << 64)
    assert Verifier(F).verify(proof, program) == VerificationResult.Accept


def test_forged_jalr_target_rejected():
    """Tampering the adder output limb steers the JALR target; the adder
    constraint (or the range/multiset side) must reject."""
    program = _control_flow_program()
    prover = Prover(F, seed=0, protocol_version=2)

    def forge(lk, table):
        rows = np.nonzero(lk["fjalr"] == 1)[0]
        assert len(rows)
        for name in ("jt_0", "jh"):
            lk[name] = lk[name].copy()
        lk["jt_0"][rows[0]] = (int(lk["jt_0"][rows[0]]) + 8) % (1 << 16)
        lk["jh"][rows[0]] = int(lk["jt_0"][rows[0]]) >> 1

    prover._bc_forge_hook = forge
    prover._bc_unsafe = True
    proof = prover.prove(program, 0x1000, None, 1 << 16, None, None)
    assert (
        Verifier(F).verify(proof, program)
        == VerificationResult.RejectInvalidBytecode
    )


def test_tampered_range_sum_rejected():
    program = _control_flow_program()
    proof = _prove(program)
    ser = BinarySerializer(F)
    restored = ser.deserialize(ser.serialize(proof))
    restored.v2.bytecode.gr_sums["grp0"] = (
        restored.v2.bytecode.gr_sums["grp0"] + 1
    ) % P
    assert (
        Verifier(F).verify(restored, program)
        == VerificationResult.RejectInvalidBytecode
    )


def test_forged_taken_bit_rejected():
    """Flipping the committed branch-taken bit (making the trace 'take'
    the untaken path) must be rejected — by the query linkage or the
    target constraint, both in the bytecode argument."""
    guest = fibonacci_guest()
    loaded = elf.load(guest)
    prover = Prover(F, seed=0, protocol_version=2)

    def forge(lk, table):
        rows = np.nonzero(lk["fbr"] == 1)[0]
        assert len(rows)
        lk["taken_b"] = lk["taken_b"].copy()
        lk["taken_b"][rows[0]] ^= 1

    prover._bc_forge_hook = forge
    prover._bc_unsafe = True
    proof = prover.prove(guest, loaded.entry_pc, None, 1 << 16,
                         loaded.segments, [6])
    assert (
        Verifier(F).verify(proof, guest)
        == VerificationResult.RejectInvalidBytecode
    )


def test_forged_link_register_carry_rejected():
    program = _control_flow_program()
    prover = Prover(F, seed=0, protocol_version=2)

    def forge(lk, table):
        rows = np.nonzero(lk["fjal"] == 1)[0]
        assert len(rows)
        lk["pc4c"] = lk["pc4c"].copy()
        lk["pc4c"][rows[0]] ^= 1

    prover._bc_forge_hook = forge
    prover._bc_unsafe = True
    proof = prover.prove(program, 0x1000, None, 1 << 16, None, None)
    assert (
        Verifier(F).verify(proof, program)
        == VerificationResult.RejectInvalidBytecode
    )


# -- LOAD/STORE linkage (memcheck byte rows <-> proven step columns) ----------


def _memory_program():
    from zigz_tpu.guest.asm import Assembler

    a = Assembler()
    a.lui("x1", 0x2)              # x1 = 0x2000 (data area)
    a.li("x2", 0xFEDCBA9876543210)
    a.sd("x2", "x1", 0)           # [0x2000] = x2
    a.lb("x3", "x1", 1)           # sign-extended 0x32 -> 0x32
    a.lb("x4", "x1", 7)           # sign-extended 0xFE -> -2
    a.lbu("x5", "x1", 7)          # 0xFE
    a.lh("x6", "x1", 4)           # sext(0xBA98)
    a.lhu("x7", "x1", 4)          # 0xBA98
    a.lw("x8", "x1", 4)           # sext(0xFEDCBA98)
    a.lwu("x9", "x1", 4)          # 0xFEDCBA98
    a.ld("x10", "x1", 0)          # full value back
    a.sb("x2", "x1", 9)           # [0x2009] = 0x10 (unaligned byte)
    a.sh("x2", "x1", 10)          # half
    a.sw("x2", "x1", 12)          # word
    a.lw("x11", "x1", 12)
    a.ebreak()
    return a.assemble()


def test_memory_program_e2e_accept():
    program = _memory_program()
    proof = _prove(program)
    M = (1 << 64) - 1
    regs = proof.public_io.final_regs
    assert regs[3] == 0x32
    assert regs[4] == (-2) & M
    assert regs[5] == 0xFE
    assert regs[6] == (0xBA98 - (1 << 16)) & M
    assert regs[7] == 0xBA98
    assert regs[8] == (0xFEDCBA98 - (1 << 32)) & M
    assert regs[9] == 0xFEDCBA98
    assert regs[10] == 0xFEDCBA9876543210
    assert regs[11] == (0x76543210 - 0) & M
    assert Verifier(F).verify(proof, program) == VerificationResult.Accept


def test_forged_loaded_value_rejected():
    """Flipping a step-side loaded byte must break the byte-row
    linkage (the memcheck rows carry the true bytes)."""
    program = _memory_program()
    prover = Prover(F, seed=0, protocol_version=2)

    def forge(lk, table):
        rows = np.nonzero(lk["fload"] == 1)[0]
        assert len(rows)
        lk["vb_0"] = lk["vb_0"].copy()
        lk["vb_0"][rows[0]] ^= 1

    prover._bc_forge_hook = forge
    prover._bc_unsafe = True
    proof = prover.prove(program, 0x1000, None, 1 << 16, None, None)
    assert (
        Verifier(F).verify(proof, program)
        == VerificationResult.RejectInvalidBytecode
    )


def test_forged_memory_address_rejected():
    """Steering a load to a different address (forged adder output limb)
    must break the linkage."""
    program = _memory_program()
    prover = Prover(F, seed=0, protocol_version=2)

    def forge(lk, table):
        rows = np.nonzero(lk["fload"] == 1)[0]
        lk["jt_0"] = lk["jt_0"].copy()
        lk["jt_0"][rows[0]] ^= 8
    prover._bc_forge_hook = forge
    prover._bc_unsafe = True
    proof = prover.prove(program, 0x1000, None, 1 << 16, None, None)
    assert (
        Verifier(F).verify(proof, program)
        == VerificationResult.RejectInvalidBytecode
    )


def test_forged_sign_extension_rejected():
    """Flipping the committed sign bit of a signed load must fail the
    sign-split (rl leaves RANGE16) or the write-value tie."""
    program = _memory_program()
    prover = Prover(F, seed=0, protocol_version=2)

    def forge(lk, table):
        rows = np.nonzero(lk["flb"] == 1)[0]
        assert len(rows)
        lk["sgn"] = lk["sgn"].copy()
        lk["sgn"][rows[0]] ^= 1

    prover._bc_forge_hook = forge
    prover._bc_unsafe = True
    proof = prover.prove(program, 0x1000, None, 1 << 16, None, None)
    assert (
        Verifier(F).verify(proof, program)
        == VerificationResult.RejectInvalidBytecode
    )


def test_forged_memcheck_base_rejected():
    """Forging the memcheck row's base-address limb breaks its own
    carry-chain constraint."""
    program = _memory_program()
    prover = Prover(F, seed=0, protocol_version=2)

    def forge(cols):
        cols["ba0"] = cols["ba0"].copy()
        cols["ba0"][0] ^= 1

    prover._mc_forge_hook = forge
    prover._mc_unsafe = True
    prover._bc_unsafe = True
    proof = prover.prove(program, 0x1000, None, 1 << 16, None, None)
    assert Verifier(F).verify(proof, program) in (
        VerificationResult.RejectInvalidMemoryAccess,
        VerificationResult.RejectInvalidBytecode,
    )


def test_tampered_mem_link_sum_rejected():
    program = _memory_program()
    proof = _prove(program)
    ser = BinarySerializer(F)
    restored = ser.deserialize(ser.serialize(proof))
    restored.v2.bytecode.wg_sum = (restored.v2.bytecode.wg_sum + 1) % P
    assert (
        Verifier(F).verify(restored, program)
        == VerificationResult.RejectInvalidBytecode
    )


# -- RV64 word ops (ADDW/SUBW/SLLW/SRLW/SRAW + immediates) --------------------


def _word_op_program():
    from zigz_tpu.guest.asm import Assembler

    a = Assembler()
    a.li("x1", 0x9234_5678)       # bit 31 set after ops -> sext paths
    a.li("x2", 0xF000_0001)
    a.addw("x3", "x1", "x2")      # wraps 32-bit, sext
    a.subw("x4", "x1", "x2")
    a.sllw("x5", "x1", "x2")      # shamt = 1
    a.srlw("x6", "x1", "x2")
    a.sraw("x7", "x1", "x2")
    a.addiw("x8", "x1", -16)
    a.slliw("x9", "x1", 4)
    a.sraiw("x10", "x1", 3)
    a.srliw("x11", "x1", 3)
    a.ebreak()
    return a.assemble()


def test_word_ops_e2e_accept():
    program = _word_op_program()
    proof = _prove(program)
    M = (1 << 64) - 1

    def sext32(v):
        v &= 0xFFFFFFFF
        return v | (0xFFFFFFFF00000000 if v >> 31 else 0)

    regs = proof.public_io.final_regs
    assert regs[3] == sext32(0x92345678 + 0xF0000001)
    assert regs[4] == sext32(0x92345678 - 0xF0000001)
    assert regs[5] == sext32(0x92345678 << 1)
    assert regs[6] == sext32(0x92345678 >> 1)
    assert regs[7] == sext32((0x92345678 - (1 << 32)) >> 1)
    assert regs[8] == sext32(0x92345678 - 16)
    assert regs[9] == sext32(0x92345678 << 4)
    assert regs[10] == sext32((0x92345678 - (1 << 32)) >> 3)
    assert regs[11] == sext32(0x92345678 >> 3)
    assert Verifier(F).verify(proof, program) == VerificationResult.Accept


def test_forged_word_op_result_rejected():
    """W-op results are now table-proven: forging the committed result
    limb must be rejected (previously W steps were free rd writes)."""
    program = _word_op_program()
    prover = Prover(F, seed=0, protocol_version=2)

    def forge(lk, table):
        rows = np.nonzero(lk["tbl1"] == 14)[0]  # ADDW (id 13) steps
        assert len(rows)
        lk["res_0"] = lk["res_0"].copy()
        lk["res_0"][rows[0]] ^= 1

    prover._bc_forge_hook = forge
    prover._bc_unsafe = True
    proof = prover.prove(program, 0x1000, None, 1 << 16, None, None)
    assert (
        Verifier(F).verify(proof, program)
        == VerificationResult.RejectInvalidBytecode
    )


# -- M extension multiplies ---------------------------------------------------


def _mul_program():
    from zigz_tpu.guest.asm import Assembler

    a = Assembler()
    a.li("x1", 0xFFFFFFFFFFFFFFFE)   # -2
    a.li("x2", 0x7FFFFFFFFFFFFFFF)   # INT_MAX
    a.mul("x3", "x1", "x2")
    a.mulh("x4", "x1", "x2")
    a.mulhu("x5", "x1", "x2")
    a.mulhsu("x6", "x1", "x2")
    a.mulw("x7", "x1", "x2")
    a.ebreak()
    return a.assemble()


def test_mul_ops_e2e_accept():
    program = _mul_program()
    proof = _prove(program)
    M = (1 << 64) - 1
    a, b = -2, 0x7FFFFFFFFFFFFFFF
    au, bu = a & M, b & M
    regs = proof.public_io.final_regs
    assert regs[3] == (a * b) & M
    assert regs[4] == ((a * b) >> 64) & M
    assert regs[5] == ((au * bu) >> 64) & M
    assert regs[6] == ((a * bu) >> 64) & M
    w = ((a * b) & 0xFFFFFFFF)
    assert regs[7] == (w | 0xFFFFFFFF00000000 if w >> 31 else w)
    assert Verifier(F).verify(proof, program) == VerificationResult.Accept


def test_forged_mul_result_rejected():
    """Multiplies were free rd writes before the mul gadgets; forging a
    committed product byte must now be rejected."""
    program = _mul_program()
    prover = Prover(F, seed=0, protocol_version=2)

    def forge(lk, table):
        rows = np.nonzero(lk["tbl1"] == 19)[0]  # MUL (id 18) steps
        assert len(rows)
        lk["res_0"] = lk["res_0"].copy()
        lk["res_0"][rows[0]] ^= 1

    prover._bc_forge_hook = forge
    prover._bc_unsafe = True
    proof = prover.prove(program, 0x1000, None, 1 << 16, None, None)
    assert (
        Verifier(F).verify(proof, program)
        == VerificationResult.RejectInvalidBytecode
    )


# -- M extension divisions ----------------------------------------------------


def _div_program():
    from zigz_tpu.guest.asm import Assembler

    a = Assembler()
    a.li("x1", -7 & ((1 << 64) - 1))
    a.li("x2", 3)
    a.li("x3", 0x8000000000000000)   # INT_MIN
    a.li("x4", -1 & ((1 << 64) - 1))
    a.div("x5", "x1", "x2")          # -7 / 3 = -2 (trunc)
    a.rem("x6", "x1", "x2")          # rem = -1
    a.divu("x7", "x1", "x2")
    a.remu("x8", "x1", "x2")
    a.div("x9", "x3", "x4")          # overflow -> INT_MIN
    a.rem("x10", "x3", "x4")         # -> 0
    a.div("x11", "x1", "zero")       # div by zero -> -1
    a.rem("x12", "x1", "zero")       # -> x1
    a.divw("x13", "x1", "x2")
    a.remw("x14", "x1", "x2")
    a.divuw("x15", "x1", "x2")
    a.remuw("x16", "x1", "x2")
    a.ebreak()
    return a.assemble()


def test_div_ops_e2e_accept():
    program = _div_program()
    proof = _prove(program)
    M = (1 << 64) - 1
    x1 = -7 & M
    regs = proof.public_io.final_regs
    assert regs[5] == -2 & M
    assert regs[6] == -1 & M
    assert regs[7] == x1 // 3
    assert regs[8] == x1 % 3
    assert regs[9] == 0x8000000000000000
    assert regs[10] == 0
    assert regs[11] == M
    assert regs[12] == x1
    # W variants: operate on low 32 bits (0xFFFFFFF9 = u32; as i32 = -7)
    assert regs[13] == -2 & M
    assert regs[14] == -1 & M
    assert regs[15] == ((0xFFFFFFF9 // 3) | 0xFFFFFFFF00000000
                        if (0xFFFFFFF9 // 3) >> 31 else 0xFFFFFFF9 // 3)
    assert regs[16] == 0xFFFFFFF9 % 3
    assert Verifier(F).verify(proof, program) == VerificationResult.Accept


def test_forged_div_result_rejected():
    program = _div_program()
    prover = Prover(F, seed=0, protocol_version=2)

    def forge(lk, table):
        rows = np.nonzero(lk["tbl1"] == 24)[0]  # DIV (id 23) steps
        assert len(rows)
        lk["res_0"] = lk["res_0"].copy()
        lk["res_0"][rows[0]] ^= 1

    prover._bc_forge_hook = forge
    prover._bc_unsafe = True
    proof = prover.prove(program, 0x1000, None, 1 << 16, None, None)
    assert (
        Verifier(F).verify(proof, program)
        == VerificationResult.RejectInvalidBytecode
    )


def test_serialization_roundtrip_bytes_stable():
    program = _nop_add_program()
    proof = _prove(program)
    ser = BinarySerializer(F)
    data = ser.serialize(proof)
    restored = ser.deserialize(data)
    assert restored.v2.bytecode is not None
    assert ser.serialize(restored) == data
    assert Verifier(F).verify(restored, program) == VerificationResult.Accept


def test_forged_final_pc_rejected():
    """PublicIO.final_pc is bound to the last step's next_pc."""
    program = _nop_add_program()
    proof = _prove(program)
    proof.public_io.final_pc += 4
    assert Verifier(F).verify(proof, program) != VerificationResult.Accept
