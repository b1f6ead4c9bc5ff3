"""Native (C++) VM equivalence tests: the native interpreter must produce
identical traces, final state, and PROOF BYTES vs the pure-Python VM for a
battery of programs covering every instruction class and edge case."""

import numpy as np
import pytest

from zigz_tpu import elf
from zigz_tpu.core.field import BabyBear as F
from zigz_tpu.guest.asm import Assembler
from zigz_tpu.guest.programs import fibonacci_guest, mul_stress_guest
from zigz_tpu.prover.prover import Prover
from zigz_tpu.prover.serialization import BinarySerializer
from zigz_tpu.runtime import native_vm
from zigz_tpu.vm.state import VMState

pytestmark = pytest.mark.skipif(not native_vm.available(), reason="no native VM")


def run_both(program: bytes, entry=0x1000, max_steps=10000, input_tape=None, initial_regs=None):
    # Python
    vm = VMState.init(program, entry, input_tape)
    if initial_regs:
        for i, v in enumerate(initial_regs):
            vm.regs.write(i, v)
        vm.trace.set_initial_regs(vm.regs.regs)
    try:
        vm.run(max_steps)
    except Exception:
        pass
    # Native
    nvm = native_vm.NativeVM()
    nvm.load_segment(entry, program)
    result = nvm.run(entry, max_steps, initial_regs, input_tape)
    return vm, result


def assert_equivalent(vm, result):
    trace = result["trace"]
    assert trace.step_count() == vm.trace.step_count()
    n = trace.step_count()
    np.testing.assert_array_equal(trace.pcs, np.array(vm.trace.pcs[:n], dtype=np.uint64))
    np.testing.assert_array_equal(trace.next_pcs, np.array(vm.trace.next_pcs[:n], dtype=np.uint64))
    assert result["final_pc"] == vm.pc
    assert result["final_regs"] == [vm.regs.read(i) for i in range(32)]
    assert result["output_tape"] == vm.output_tape
    assert result["halted"] == vm.halted
    # Register write deltas match.
    assert [tuple(map(int, w)) for w in trace.reg_writes] == [
        tuple(map(int, w)) for w in vm.trace.reg_writes[:n]
    ]
    # Instruction fields + memory accesses + lookup presence match.
    py_insts = vm.trace.instructions
    for i in range(n):
        c = trace.columns
        assert (int(c["opcode"][i]), int(c["rd"][i]), int(c["funct3"][i]),
                int(c["rs1"][i]), int(c["rs2"][i]), int(c["funct7"][i]),
                int(c["imm"][i])) == (
            py_insts[i].opcode, py_insts[i].rd, py_insts[i].funct3,
            py_insts[i].rs1, py_insts[i].rs2, py_insts[i].funct7, py_insts[i].imm)
    py_lookups = [t is not None for t in vm.trace.lookup_tables]
    assert (trace.lookup_ids >= 0).tolist() == py_lookups


PROGRAMS = {
    "arith": lambda a: (a.li("t0", 123), a.li("t1", -456), a.add("t2", "t0", "t1"),
                        a.sub("t3", "t0", "t1"), a.xor("t4", "t0", "t1"),
                        a.and_("t5", "t0", "t1"), a.or_("t6", "t0", "t1"), a.ebreak()),
    "muldiv": lambda a: (a.li("t0", -5), a.li("t1", 3), a.mul("t2", "t0", "t1"),
                         a.mulh("t3", "t0", "t1"), a.mulhu("t4", "t0", "t1"),
                         a.div("t5", "t0", "t1"), a.rem("t6", "t0", "t1"),
                         a.divu("s2", "t0", "t1"), a.remu("s3", "t0", "t1"), a.ebreak()),
    "divzero": lambda a: (a.li("t0", 20), a.li("t1", 0), a.div("t2", "t0", "t1"),
                          a.divu("t3", "t0", "t1"), a.rem("t4", "t0", "t1"),
                          a.remu("t5", "t0", "t1"), a.ebreak()),
    "shifts": lambda a: (a.li("t0", -1), a.slli("t1", "t0", 31), a.srli("t2", "t0", 7),
                         a.srai("t3", "t0", 7), a.li("t4", 63), a.sll("t5", "t0", "t4"),
                         a.srl("t6", "t0", "t4"), a.sra("s2", "t0", "t4"), a.ebreak()),
    "memory": lambda a: (a.li("t0", 0xDEAD), a.li("t1", 0x2000), a.sd("t0", "t1", 0),
                         a.ld("t2", "t1", 0), a.sw("t0", "t1", 8), a.lw("t3", "t1", 8),
                         a.ebreak()),
    "branches": lambda a: (a.li("t0", 5), a.li("t1", 5), a.label("top"),
                           a.beq("t0", "t1", "eq"), a.nop(), a.label("eq"),
                           a.bne("t0", "zero", "dec"), a.j("out"), a.label("dec"),
                           a.addi("t0", "t0", -1), a.j("top"), a.label("out"), a.ebreak()),
    "jumps": lambda a: (a.jal("ra", "sub"), a.j("end"), a.label("sub"),
                        a.li("t0", 77), a.jalr("zero", "ra", 0), a.label("end"), a.ebreak()),
}


@pytest.mark.parametrize("name", list(PROGRAMS))
def test_program_equivalence(name):
    a = Assembler()
    PROGRAMS[name](a)
    vm, result = run_both(a.assemble())
    assert_equivalent(vm, result)


def test_fall_off_program_invalid_halt():
    # Program without EBREAK falls into zero words -> decode failure -> halt.
    a = Assembler()
    a.li("t0", 1)
    vm, result = run_both(a.assemble())
    assert result["status"] == native_vm.STATUS_INVALID
    assert_equivalent(vm, result)


def test_io_tapes_equivalence():
    guest = fibonacci_guest()
    loaded = elf.load(guest)
    vm = VMState.init_from_segments(loaded.segments, loaded.entry_pc, [12])
    vm.run(10000)
    nvm = native_vm.NativeVM()
    for seg in loaded.segments:
        nvm.load_segment(seg.vaddr, seg.data)
    result = nvm.run(loaded.entry_pc, 10000, None, [12])
    assert_equivalent(vm, result)
    assert result["output_tape"] == vm.output_tape


def test_initial_regs_equivalence():
    a = Assembler()
    a.add("t2", "t0", "t1")
    a.ebreak()
    regs = [0] * 32
    regs[5], regs[6] = 100, 23
    vm, result = run_both(a.assemble(), initial_regs=regs)
    assert_equivalent(vm, result)
    assert result["final_regs"][7] == 123


def test_proof_bytes_native_vs_python():
    """The decisive check: proofs from both VMs are byte-identical."""
    ser = BinarySerializer(F)
    for guest_fn, tape in ((fibonacci_guest, [9]), (mul_stress_guest, [17])):
        guest = guest_fn()
        loaded = elf.load(guest)
        p_native = Prover(F, seed=0, use_native_vm=True).prove(
            guest, loaded.entry_pc, None, 1 << 16, loaded.segments, tape
        )
        p_python = Prover(F, seed=0, use_native_vm=False).prove(
            guest, loaded.entry_pc, None, 1 << 16, loaded.segments, tape
        )
        assert ser.serialize(p_native) == ser.serialize(p_python)


def test_proof_bytes_with_memory_and_branches():
    ser = BinarySerializer(F)
    a = Assembler()
    a.li("t0", 10)
    a.li("t1", 0x3000)
    a.label("loop")
    a.beq("t0", "zero", "done")
    a.sd("t0", "t1", 0)
    a.ld("t2", "t1", 0)
    a.addi("t1", "t1", 8)
    a.addi("t0", "t0", -1)
    a.j("loop")
    a.label("done")
    a.ebreak()
    program = a.assemble()
    pn = Prover(F, seed=0, use_native_vm=True).prove(program, 0x1000, None, 1 << 12, None, None)
    pp = Prover(F, seed=0, use_native_vm=False).prove(program, 0x1000, None, 1 << 12, None, None)
    assert ser.serialize(pn) == ser.serialize(pp)
