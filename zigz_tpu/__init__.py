"""zigz_tpu — a TPU-native Jolt-style zkVM proving framework.

A from-scratch reimplementation of the capability surface of the zigz zkVM
(reference: /root/reference, a Zig CPU implementation), redesigned for TPU:

* BabyBear field lanes as 32-bit Montgomery arithmetic in JAX/Pallas
  (zigz_tpu.ops);
* MLE fold/eval and sumcheck round reductions as device kernels, sharded
  over the trace/hypercube axis via jax.sharding.Mesh (zigz_tpu.parallel);
* a bit-exact host pipeline (VM, transcript, Merkle commitments, proof
  serialization) whose proof bytes match the reference's "ZIGZ" v1 format.

Public API mirrors the reference's lib.zig re-exports.
"""

from .core import field as field
from .core.field import (
    BabyBear,
    F17,
    Field,
    Goldilocks,
    KoalaBear,
    Mersenne31,
    Mersenne61,
)
from .core.hash import FiatShamirTranscript, SHA3Hasher
from .core import xoshiro as xoshiro
from .poly.multilinear import Multilinear
from .poly.univariate import Univariate
from . import elf as elf
from .vm.state import VMState
from .vm.memory import Memory
from .vm.registers import RegisterFile
from .vm.trace import ExecutionTrace
from .constraints.witness import Witness, WitnessGenerator
from .constraints.builder import ConstraintSystem
from .proofs.sumcheck import SumcheckProof, SumcheckProver, SumcheckVerifier
from .commitments.merkle import SimpleMerkleTree
from .commitments.commit import CommitmentScheme
from .prover.prover import Prover
from .prover.proof import Proof, PublicIO, VerificationResult
from .prover import serialization as serialization
from .verifier.verifier import Verifier

__version__ = "0.1.0"

# Best-effort: build/load the native SHA3 runtime and install it as the
# Merkle hashing backend (falls back to pure Python silently).
try:  # pragma: no cover - environment-dependent
    from . import runtime as runtime  # noqa: F401
except Exception:
    pass

__all__ = [
    "BabyBear", "F17", "Field", "Goldilocks", "KoalaBear", "Mersenne31",
    "Mersenne61", "FiatShamirTranscript", "SHA3Hasher", "Multilinear",
    "Univariate", "elf", "VMState", "Memory", "RegisterFile",
    "ExecutionTrace", "Witness", "WitnessGenerator", "ConstraintSystem",
    "SumcheckProof", "SumcheckProver", "SumcheckVerifier",
    "SimpleMerkleTree", "CommitmentScheme", "Prover", "Proof", "PublicIO",
    "VerificationResult", "serialization", "Verifier", "field", "xoshiro",
]
