"""Full pipeline demo (examples/prover_verifier_demo.zig port): raw RISC-V
program -> trace -> witness -> sumcheck+Lasso bindings -> Merkle
commitments -> serialized proof -> verification, with phase narration."""

import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from zigz_tpu.core.field import BabyBear as F
from zigz_tpu.prover.prover import Prover
from zigz_tpu.prover.serialization import BinarySerializer
from zigz_tpu.verifier.verifier import Verifier


def main():
    # x1 = 5; x2 = 10; x3 = x1 + x2; store x3; load back; halt.
    program = bytes([
        0x93, 0x00, 0x50, 0x00,  # ADDI x1, x0, 5
        0x13, 0x01, 0xA0, 0x00,  # ADDI x2, x0, 10
        0xB3, 0x81, 0x20, 0x00,  # ADD x3, x1, x2
        0x23, 0x30, 0x30, 0x00,  # SD x3, 0(x0)
        0x03, 0x32, 0x00, 0x00,  # LD x4, 0(x0)
        0x73, 0x00, 0x10, 0x00,  # EBREAK
    ])

    prover = Prover(F, seed=0)
    proof = prover.prove(program, 0x1000, None, 100, None, None)

    print(f"steps:              {proof.metadata.num_steps}")
    print(f"hypercube vars:     {proof.metadata.num_vars}")
    print(f"witness commitments:{len(proof.witness_commitments)}")
    print(f"lasso proofs:       {len(proof.lookup_proofs)}")
    print(f"final x3:           {proof.public_io.final_regs[3]}")
    print(f"final x4:           {proof.public_io.final_regs[4]}")
    for k, v in prover.last_timings.items():
        if k.endswith("_s"):
            print(f"  {k:<20}{v * 1e3:8.2f} ms")

    proof_bytes = BinarySerializer(F).serialize(proof)
    print(f"serialized:         {len(proof_bytes)} bytes")

    result = Verifier(F).verify(BinarySerializer(F).deserialize(proof_bytes), program)
    print(f"verification:       {result}")
    assert result == "Accept"
    assert proof.public_io.final_regs[3] == 15
    assert proof.public_io.final_regs[4] == 15


if __name__ == "__main__":
    main()
