"""Fibonacci guest/host end-to-end example (examples/fibonacci.zig port).

Host: build the guest ELF with the built-in assembler, pass the input tape
[n], prove, read fib(n)/fib(n+1) from the committed outputs, verify.
"""

import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from zigz_tpu import elf
from zigz_tpu.core.field import BabyBear as F
from zigz_tpu.guest.programs import fibonacci_guest
from zigz_tpu.prover.prover import Prover
from zigz_tpu.prover.serialization import BinarySerializer
from zigz_tpu.verifier.verifier import Verifier


def fib(n):
    a, b = 0, 1
    for _ in range(n):
        a, b = b, a + b
    return a


def main(n=10):
    guest = fibonacci_guest()
    print(f"guest ELF: {len(guest)} bytes")

    loaded = elf.load(guest)
    print(f"entry 0x{loaded.entry_pc:x}, {len(loaded.segments)} segment(s)")

    t0 = time.perf_counter()
    proof = Prover(F, seed=0).prove(guest, loaded.entry_pc, None, 1 << 20, loaded.segments, [n])
    prove_ms = (time.perf_counter() - t0) * 1e3

    outputs = proof.public_io.outputs
    print(f"proved {proof.metadata.num_steps} steps in {prove_ms:.0f} ms")
    print(f"guest committed: fib({n}) = {outputs[0]}, fib({n + 1}) = {outputs[1]}")
    assert outputs == [fib(n), fib(n + 1)], "guest output mismatch!"

    proof_bytes = BinarySerializer(F).serialize(proof)
    print(f"proof: {len(proof_bytes)} bytes")

    t0 = time.perf_counter()
    result = Verifier(F).verify(proof, guest)
    verify_ms = (time.perf_counter() - t0) * 1e3
    print(f"verify: {result} in {verify_ms:.1f} ms")
    assert result == "Accept"


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 10)
