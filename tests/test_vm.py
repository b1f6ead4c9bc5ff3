"""VM core tests — ports of the colocated tests in state.zig:606-699,
memory.zig, registers.zig, trace.zig, plus ECALL/EBREAK protocol coverage."""

import pytest

from zigz_tpu.vm.memory import LoadSize, Memory
from zigz_tpu.vm.registers import RegisterFile, register_name
from zigz_tpu.vm.state import (
    UnimplementedInstruction,
    UnimplementedSYSTEM,
    VMHalted,
    VMState,
)
from zigz_tpu.vm.trace import extract_lookups, verify_trace_consistency
from zigz_tpu.isa.rv64i import InvalidInstruction


def test_execute_addi():
    vm = VMState.init(bytes([0x13, 0x05, 0xA0, 0x02]), 0x1000, None)  # ADDI x10, x0, 42
    vm.step()
    assert vm.regs.read(10) == 42
    assert vm.pc == 0x1004
    assert vm.step_count == 1


def test_execute_add():
    program = bytes([
        0x13, 0x05, 0xA0, 0x00,  # ADDI x10, x0, 10
        0x93, 0x05, 0x40, 0x01,  # ADDI x11, x0, 20
        0x33, 0x06, 0xB5, 0x00,  # ADD x12, x10, x11
    ])
    vm = VMState.init(program, 0x1000, None)
    vm.run(5)
    assert vm.regs.read(10) == 10
    assert vm.regs.read(11) == 20
    assert vm.regs.read(12) == 30


def test_execute_lw_sw():
    program = bytes([
        0x13, 0x05, 0x40, 0x06,  # ADDI x10, x0, 100
        0x23, 0x20, 0xA0, 0x00,  # SW x10, 0(x0)
        0x83, 0x25, 0x00, 0x00,  # LW x11, 0(x0)
    ])
    vm = VMState.init(program, 0x1000, None)
    vm.run(5)
    assert vm.regs.read(11) == 100


def test_execute_beq():
    program = bytes([
        0x13, 0x05, 0x50, 0x00,  # ADDI x10, x0, 5
        0x93, 0x05, 0x50, 0x00,  # ADDI x11, x0, 5
        0x63, 0x04, 0xB5, 0x00,  # BEQ x10, x11, 8
        0x13, 0x06, 0x30, 0x06,  # ADDI x12, x0, 99 (skipped)
        0x93, 0x06, 0xA0, 0x02,  # ADDI x13, x0, 42
    ])
    vm = VMState.init(program, 0x1000, None)
    vm.run(10)
    assert vm.regs.read(12) == 0
    assert vm.regs.read(13) == 42


def test_trace_records_all_steps():
    program = bytes([
        0x13, 0x05, 0xA0, 0x02,  # ADDI x10, x0, 42
        0x93, 0x05, 0xB0, 0x03,  # ADDI x11, x0, 59
    ])
    vm = VMState.init(program, 0x1000, None)
    vm.run(5)
    assert vm.trace.step_count() == 2
    stats = vm.trace.stats()
    assert stats.total_steps == 2
    assert stats.instruction_counts.get("addi") == 2
    verify_trace_consistency(vm.trace)


def test_trace_lookup_extraction():
    program = bytes([0x33, 0x06, 0xB5, 0x00])  # ADD x12, x10, x11
    vm = VMState.init(program, 0x1000, None)
    vm.step()
    lookups = extract_lookups(vm.trace)
    assert len(lookups) == 1
    assert lookups[0].table.name == "ADD"


def test_halt_on_invalid_instruction():
    vm = VMState.init(bytes([0x13, 0x05, 0xA0, 0x02, 0, 0, 0, 0]), 0x1000, None)
    vm.step()
    with pytest.raises(InvalidInstruction):
        vm.step()
    assert vm.halted
    with pytest.raises(VMHalted):
        vm.step()


def test_run_treats_invalid_as_halt():
    vm = VMState.init(bytes([0x13, 0x05, 0xA0, 0x02]), 0x1000, None)
    vm.run(100)  # falls off the program into zeros -> clean return
    assert vm.halted
    assert vm.trace.step_count() == 1


def test_unimplemented_opcode_raises():
    # LOAD_FP (0b0000111) -> UnimplementedInstruction propagates.
    word = 0b0000111
    vm = VMState.init(word.to_bytes(4, "little"), 0x1000, None)
    with pytest.raises(UnimplementedInstruction):
        vm.step()
    assert not vm.halted  # only decode failures set halted


def test_ebreak_halts_with_same_pc():
    # EBREAK = 0x00100073
    vm = VMState.init((0x00100073).to_bytes(4, "little"), 0x1000, None)
    vm.step()
    assert vm.halted
    assert vm.pc == 0x1000  # next_pc == pc (state.zig:588-592)
    assert vm.trace.next_pcs[0] == 0x1000


def test_ecall_commit_and_read():
    # a7=2 (read), ecall -> a0 = input; a7=1 (commit), ecall; ebreak
    program = bytes([
        0x93, 0x08, 0x20, 0x00,  # ADDI x17, x0, 2 (ECALL_READ)
        0x73, 0x00, 0x00, 0x00,  # ECALL
        0x93, 0x08, 0x10, 0x00,  # ADDI x17, x0, 1 (ECALL_COMMIT)
        0x73, 0x00, 0x00, 0x00,  # ECALL
        0x73, 0x00, 0x10, 0x00,  # EBREAK
    ])
    vm = VMState.init(program, 0x1000, [77])
    vm.run(10)
    assert vm.halted
    assert vm.output_tape == [77]


def test_ecall_read_underflow_returns_zero():
    program = bytes([
        0x93, 0x08, 0x20, 0x00,  # ADDI x17, x0, 2
        0x73, 0x00, 0x00, 0x00,  # ECALL (empty tape)
        0x73, 0x00, 0x10, 0x00,  # EBREAK
    ])
    vm = VMState.init(program, 0x1000, None)
    vm.run(10)
    assert vm.regs.read(10) == 0


def test_ecall_unknown_syscall_noop():
    program = bytes([
        0x93, 0x08, 0x90, 0x00,  # ADDI x17, x0, 9 (unknown)
        0x73, 0x00, 0x00, 0x00,  # ECALL
        0x73, 0x00, 0x10, 0x00,  # EBREAK
    ])
    vm = VMState.init(program, 0x1000, None)
    vm.run(10)
    assert vm.halted and vm.output_tape == []


def test_csr_unimplemented():
    # CSRRW (funct3=1) -> UnimplementedSYSTEM.
    word = 0x73 | (1 << 12)
    vm = VMState.init(word.to_bytes(4, "little"), 0x1000, None)
    with pytest.raises(UnimplementedSYSTEM):
        vm.step()


def test_jal_jalr():
    program = bytes([
        0xEF, 0x00, 0x80, 0x00,  # JAL x1, 8
        0x13, 0x06, 0x30, 0x06,  # ADDI x12, x0, 99 (skipped)
        0x67, 0x80, 0x00, 0x00,  # JALR x0, x1, 0 -> back to 0x1004
    ])
    vm = VMState.init(program, 0x1000, None)
    vm.step()
    assert vm.regs.read(1) == 0x1004
    assert vm.pc == 0x1008
    vm.step()  # JALR back to ra
    assert vm.pc == 0x1004
    vm.step()  # now execute the ADDI
    assert vm.regs.read(12) == 99


def test_fence_noop():
    word = 0x0000000F  # FENCE
    vm = VMState.init(word.to_bytes(4, "little"), 0x1000, None)
    vm.step()
    assert vm.pc == 0x1004


# -- memory semantics (memory.zig colocated tests) -----------------------

def test_memory_sparse_zero_semantics():
    m = Memory()
    assert m.load_byte(0x12345) == 0
    m.store_byte(0x12345, 7)
    assert m.load_byte(0x12345) == 7
    m.store_byte(0x12345, 0)  # storing zero deletes the entry
    assert m.load_byte(0x12345) == 0
    assert m.stats().allocated_bytes == 0


def test_memory_little_endian_composition():
    m = Memory()
    m.store_word(0x100, 0xDEADBEEF)
    assert m.load_byte(0x100) == 0xEF
    assert m.load_byte(0x103) == 0xDE
    assert m.load_word(0x100) == 0xDEADBEEF
    m.store_doubleword(0x200, 0x0123456789ABCDEF)
    assert m.load_doubleword(0x200) == 0x0123456789ABCDEF
    assert m.load_word(0x200) == 0x89ABCDEF


def test_memory_sign_extension():
    m = Memory()
    m.store_byte(0x10, 0x80)
    assert m.load_sign_extended(0x10, LoadSize.Byte) == -128
    assert m.load_zero_extended(0x10, LoadSize.Byte) == 0x80
    m.store_halfword(0x20, 0x8000)
    assert m.load_sign_extended(0x20, LoadSize.Halfword) == -32768


# -- registers (registers.zig colocated tests) ---------------------------

def test_x0_hardwired():
    r = RegisterFile()
    r.write(0, 12345)
    assert r.read(0) == 0
    r.write(5, 99)
    assert r.read(5) == 99


def test_register_names():
    assert register_name(0) == "zero"
    assert register_name(1) == "ra"
    assert register_name(2) == "sp"
    assert register_name(10) == "a0"
    assert register_name(17) == "a7"
    assert register_name(31) == "t6"
