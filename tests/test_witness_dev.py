"""Device witness construction parity vs the host generator."""

import numpy as np
import pytest

from zigz_tpu import elf
from zigz_tpu.core.field import BabyBear as F
from zigz_tpu.constraints.witness import WitnessGenerator
from zigz_tpu.guest.asm import Assembler
from zigz_tpu.guest.programs import fibonacci_guest, mul_stress_guest
from zigz_tpu.runtime import native_vm

pytestmark = pytest.mark.skipif(not native_vm.available(), reason="no native VM")


def _native_trace(program=None, segments=None, entry=0x1000, tape=None, initial_regs=None):
    nvm = native_vm.NativeVM()
    if segments is not None:
        for seg in segments:
            nvm.load_segment(seg.vaddr, seg.data)
    else:
        nvm.load_segment(entry, program)
    return nvm.run(entry, 10000, initial_regs, tape)["trace"]


def _check(trace):
    from zigz_tpu.ops.witness_dev import build_witness_device

    host = WitnessGenerator.generate(F, trace)
    dev = np.asarray(build_witness_device(trace, trace.initial_regs, host.num_vars))
    np.testing.assert_array_equal(dev.astype(np.uint64), host.matrix)


def test_fibonacci_witness_parity():
    loaded = elf.load(fibonacci_guest())
    _check(_native_trace(segments=loaded.segments, entry=loaded.entry_pc, tape=[9]))


def test_mul_stress_witness_parity():
    loaded = elf.load(mul_stress_guest())
    _check(_native_trace(segments=loaded.segments, entry=loaded.entry_pc, tape=[25]))


def test_memory_and_padding_parity():
    a = Assembler()
    a.li("t0", 0xDEADBEEF)
    a.li("t1", 0x3000)
    a.sd("t0", "t1", 0)
    a.ld("t2", "t1", 0)
    a.lw("t3", "t1", 0)  # sign-extended load -> big u64 value mod p
    a.ebreak()
    _check(_native_trace(a.assemble()))


def test_initial_regs_parity():
    a = Assembler()
    a.add("t2", "t0", "t1")
    a.ebreak()
    regs = [0] * 32
    regs[5], regs[6] = (1 << 63) + 12345, 999  # needs full u64 mod p
    _check(_native_trace(a.assemble(), initial_regs=regs))


def test_nonpow2_trace_padding():
    a = Assembler()
    for i in range(5):  # 5 steps + ebreak = 6 -> pads to 8
        a.addi("t0", "t0", 1)
    a.ebreak()
    _check(_native_trace(a.assemble()))
