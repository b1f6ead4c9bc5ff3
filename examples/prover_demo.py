"""Full prover demo (examples/prover_demo.zig port): three demos walking
the proof-generation pipeline — a simple arithmetic program, a Fibonacci
loop in raw RV64I, and proof serialization round-tripping.
"""

import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from zigz_tpu.core.field import BabyBear as F
from zigz_tpu.prover.prover import Prover
from zigz_tpu.prover.serialization import BinarySerializer


def arithmetic_demo():
    print("\n--- Demo 1: simple arithmetic (x3 = 10 + 32) ---")
    program = bytes([
        0x93, 0x00, 0xA0, 0x00,  # ADDI x1, x0, 10
        0x13, 0x01, 0x00, 0x02,  # ADDI x2, x0, 32
        0xB3, 0x81, 0x20, 0x00,  # ADD x3, x1, x2
        0x73, 0x00, 0x10, 0x00,  # EBREAK
    ])
    proof = Prover(F, seed=0).prove(program, 0x1000, None, 100, None, None)
    print(f"  steps: {proof.metadata.num_steps}, "
          f"x3 = {proof.public_io.final_regs[3]}")
    assert proof.public_io.final_regs[3] == 42


def fibonacci_demo():
    print("\n--- Demo 2: Fibonacci loop in raw RV64I ---")
    # x1,x2 = fib pair; x3 = counter; loop: x4=x1+x2; x1=x2; x2=x4; x3-=1
    program = bytes([
        0x93, 0x00, 0x00, 0x00,  # ADDI x1, x0, 0      fib(0)
        0x13, 0x01, 0x10, 0x00,  # ADDI x2, x0, 1      fib(1)
        0x93, 0x01, 0xA0, 0x00,  # ADDI x3, x0, 10     10 iterations
        # loop:
        0x33, 0x02, 0x20, 0x00,  # ADD  x4, x0, x2
        0x33, 0x81, 0x20, 0x00,  # ADD  x2, x1, x2
        0xB3, 0x00, 0x40, 0x00,  # ADD  x1, x0, x4
        0x93, 0x81, 0xF1, 0xFF,  # ADDI x3, x3, -1
        0xE3, 0x98, 0x01, 0xFE,  # BNE  x3, x0, -16 (loop)
        0x73, 0x00, 0x10, 0x00,  # EBREAK
    ])
    proof = Prover(F, seed=0).prove(program, 0x1000, None, 1000, None, None)
    print(f"  steps: {proof.metadata.num_steps}, "
          f"fib(10) = {proof.public_io.final_regs[1]}")
    assert proof.public_io.final_regs[1] == 55


def serialization_demo():
    print("\n--- Demo 3: proof serialization ---")
    program = bytes([
        0x93, 0x00, 0x10, 0x00,  # ADDI x1, x0, 1
        0x73, 0x00, 0x10, 0x00,  # EBREAK
    ])
    proof = Prover(F, seed=0).prove(program, 0x1000, None, 100, None, None)
    ser = BinarySerializer(F)
    blob = ser.serialize(proof)
    restored = ser.deserialize(blob)
    blob2 = ser.serialize(restored)
    print(f"  serialized {len(blob)} bytes; roundtrip "
          f"{'byte-identical' if blob == blob2 else 'MISMATCH'}")
    assert blob == blob2


def main():
    print("zigz_tpu - full prover demonstration")
    arithmetic_demo()
    fibonacci_demo()
    serialization_demo()
    print("\nall demos complete")


if __name__ == "__main__":
    main()
