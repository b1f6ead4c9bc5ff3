"""Guest toolchain tests: assembler round-trip through the decoder, ELF
loading, and the fibonacci guest/host end-to-end flow
(examples/fibonacci.zig:21-144 equivalent)."""

from zigz_tpu import elf
from zigz_tpu.core.field import BabyBear as F
from zigz_tpu.guest.asm import Assembler
from zigz_tpu.guest.programs import echo_guest, fibonacci_guest, mul_stress_guest
from zigz_tpu.isa import rv64i
from zigz_tpu.prover.prover import Prover
from zigz_tpu.prover.proof import VerificationResult
from zigz_tpu.verifier.verifier import Verifier
from zigz_tpu.vm.state import VMState


def fib(n):
    a, b = 0, 1
    for _ in range(n):
        a, b = b, a + b
    return a


def test_assembler_decode_roundtrip():
    a = Assembler()
    a.addi("a0", "zero", 42)
    a.add("a1", "a0", "a0")
    a.mul("a2", "a0", "a1")
    a.sub("a3", "a2", "a0")
    code = a.assemble()
    insts = [rv64i.decode(int.from_bytes(code[i : i + 4], "little")) for i in range(0, len(code), 4)]
    assert [i.name() for i in insts] == ["addi", "add", "mul", "sub"]
    assert insts[0].imm == 42 and insts[0].rd == 10
    assert insts[2].funct7 == 1


def test_assembler_branches_and_labels():
    a = Assembler()
    a.li("t0", 3)
    a.li("t1", 0)
    a.label("loop")
    a.beq("t0", "zero", "done")
    a.add("t1", "t1", "t0")
    a.addi("t0", "t0", -1)
    a.j("loop")
    a.label("done")
    a.ebreak()
    vm = VMState.init(a.assemble(), 0x1000, None)
    vm.run(100)
    assert vm.halted
    assert vm.regs.read(6) == 3 + 2 + 1  # t1


def test_li_wide_values():
    for value in (0, 1, -1 & ((1 << 64) - 1), 2047, 2048, 0x7FFFFFFF,
                  0x80000000, 0xDEADBEEF, 0x123456789ABCDEF0):
        a = Assembler()
        a.li("a0", value)
        a.ebreak()
        vm = VMState.init(a.assemble(), 0x1000, None)
        vm.run(100)
        assert vm.regs.read(10) == value & ((1 << 64) - 1), hex(value)


def test_elf_roundtrip():
    data = fibonacci_guest()
    assert elf.is_elf(data)
    result = elf.load(data)
    assert result.entry_pc == 0x1000
    assert len(result.segments) == 1
    assert result.segments[0].vaddr == 0x1000


def test_fibonacci_execute():
    data = fibonacci_guest()
    result = elf.load(data)
    vm = VMState.init_from_segments(result.segments, result.entry_pc, [10])
    vm.run(1000)
    assert vm.halted
    assert vm.output_tape == [fib(10), fib(11)]


def test_fibonacci_prove_verify_end_to_end():
    """The flagship example: guest ELF -> prove with input tape -> outputs in
    PublicIO -> verify accepts (examples/fibonacci.zig flow)."""
    data = fibonacci_guest()
    result = elf.load(data)
    proof = Prover(F, seed=0).prove(
        data, result.entry_pc, None, 1 << 20, result.segments, [10]
    )
    assert proof.public_io.outputs == [fib(10), fib(11)]
    assert Verifier(F).verify(proof, data) == VerificationResult.Accept


def test_echo_guest():
    data = echo_guest(3)
    result = elf.load(data)
    vm = VMState.init_from_segments(result.segments, result.entry_pc, [7, 8, 9])
    vm.run(1000)
    assert vm.output_tape == [7, 8, 9]


def test_mul_stress_guest():
    data = mul_stress_guest()
    result = elf.load(data)
    vm = VMState.init_from_segments(result.segments, result.entry_pc, [50])
    vm.run(10000)
    assert vm.halted
    assert len(vm.output_tape) == 1
    # Cross-check the accumulator against a Python model of the guest.
    x, y, acc = 0x12345, 0x6789B, 0
    for _ in range(50):
        prod = (x * y) & ((1 << 64) - 1)
        hi = (x * y) >> 64
        t4 = (prod ^ hi) % 1000003
        acc += t4
        x = (x + t4) & ((1 << 64) - 1)
    assert vm.output_tape[0] == acc & ((1 << 64) - 1)


def test_sort_guest_executes():
    from zigz_tpu.guest.programs import sort_guest

    data = sort_guest()
    result = elf.load(data)
    values = [9, 3, 3, 17, 0, 2**63 + 5, 1, 42]
    vm = VMState.init_from_segments(
        result.segments, result.entry_pc, [len(values)] + values
    )
    vm.run(100000)
    assert vm.halted
    assert vm.output_tape == sorted(values)


def test_sort_guest_proves_v2():
    """The SDK-built sort guest (procedures, counted loops, loads/stores)
    survives the full v2 execution proof including the byte-level memory
    check and control-flow constraints."""
    from zigz_tpu.guest.programs import sort_guest
    from zigz_tpu.prover.prover import Prover

    data = sort_guest()
    result = elf.load(data)
    values = [5, 1, 4, 1, 3]
    proof = Prover(F, seed=0, protocol_version=2).prove(
        data, result.entry_pc, None, 1 << 14, result.segments,
        [len(values)] + values,
    )
    assert proof.public_io.outputs == sorted(values)
    assert Verifier(F).verify(proof, data) == VerificationResult.Accept


def test_for_range_and_procedures():
    """SDK primitives in isolation: nested for_range, call/ret, push/pop."""
    from zigz_tpu.guest.asm import Assembler

    a = Assembler(0x1000)
    a.li("sp", 0x80000)
    a.li("s0", 0)
    with a.for_range("t0", 5):
        with a.for_range("t1", 3, bound_reg="t3"):
            a.call("bump")
    a.io_commit("s0")
    a.ebreak()
    a.label("bump")
    a.push("ra")
    a.addi("s0", "s0", 2)
    a.pop("ra")
    a.ret()
    data = a.to_elf()
    result = elf.load(data)
    vm = VMState.init_from_segments(result.segments, result.entry_pc, [])
    vm.run(10000)
    assert vm.halted
    assert vm.output_tape == [30]  # 5 * 3 * 2
