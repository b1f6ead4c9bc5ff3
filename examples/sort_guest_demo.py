"""Guest SDK demo: an insertion-sort guest written with the assembler
DSL's procedures (call/ret + stack) and counted loops (for_range), proven
end-to-end under protocol v2 — the full execution proof including the
byte-level memory check its loads/stores exercise.

This goes beyond the reference's guest surface (a Zig cross-compile,
build.zig:82-110): guests here are built in-process, no toolchain needed.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from zigz_tpu import elf
from zigz_tpu.core.field import BabyBear as F
from zigz_tpu.guest.programs import sort_guest
from zigz_tpu.prover.prover import Prover
from zigz_tpu.prover.serialization import BinarySerializer
from zigz_tpu.verifier.verifier import Verifier


def main():
    data = sort_guest()
    loaded = elf.load(data)
    values = [961, 7, 123456789, 7, 0, 2**40 + 1, 55, 3]
    print(f"guest ELF: {len(data)} bytes, entry 0x{loaded.entry_pc:x}")
    print(f"input:  {values}")

    t0 = time.perf_counter()
    proof = Prover(F, seed=0, protocol_version=2).prove(
        data, loaded.entry_pc, None, 1 << 14, loaded.segments,
        [len(values)] + values,
    )
    prove_s = time.perf_counter() - t0
    print(f"output: {proof.public_io.outputs}")
    assert proof.public_io.outputs == sorted(values)

    blob = BinarySerializer(F).serialize(proof)
    t0 = time.perf_counter()
    result = Verifier(F).verify(proof, data)
    verify_s = time.perf_counter() - t0
    print(f"steps {proof.metadata.num_steps}, proof {len(blob)} bytes, "
          f"prove {prove_s:.2f}s, verify {verify_s:.3f}s -> {result}")


if __name__ == "__main__":
    main()
