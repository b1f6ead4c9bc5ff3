"""Failure detection + deterministic restart (parallel/recovery.py).

The reference has no failure story (SURVEY.md §5); these tests exercise
the new supervisor end to end with injected faults, in the spirit of the
reference's proof-tampering tests (integration_tests.zig tests 6-8):
kill a worker mid-job, wedge one without a heartbeat, and require the
restarted run to reproduce byte-identical proof bytes.
"""

import hashlib
import json
import os

import pytest

from zigz_tpu.core.field import BabyBear as F
from zigz_tpu.parallel.recovery import JobFailed, JobSupervisor, ProveJobSpec
from zigz_tpu.prover.prover import Prover
from zigz_tpu.prover.serialization import BinarySerializer

PROGRAM = bytes([
    0x93, 0x00, 0x50, 0x00,  # ADDI x1, x0, 5
    0x13, 0x01, 0xA0, 0x00,  # ADDI x2, x0, 10
    0xB3, 0x01, 0x20, 0x00,  # ADD x3, x1, x2
    0x73, 0x00, 0x10, 0x00,  # EBREAK
])


def reference_bytes(protocol_version: int = 1) -> bytes:
    proof = Prover(F, seed=0, protocol_version=protocol_version).prove(
        PROGRAM, 0x1000, None, 1 << 10, None, None
    )
    return BinarySerializer(F).serialize(proof)


def test_clean_run(tmp_path):
    sup = JobSupervisor(str(tmp_path / "job"), heartbeat_timeout_s=10,
                        deadline_s=120, max_restarts=0)
    res = sup.run(ProveJobSpec(program=PROGRAM, max_steps=1 << 10))
    assert res.restarts == 0 and res.attempts == 1
    with open(res.proof_path, "rb") as f:
        data = f.read()
    assert hashlib.sha256(data).hexdigest() == res.sha256
    assert data == reference_bytes()


def test_crash_restart_is_deterministic(tmp_path):
    """SIGKILL'd worker (simulated host loss) -> detected via process
    death -> restart produces the same proof bytes as an in-process
    prove."""
    sup = JobSupervisor(str(tmp_path / "job"), heartbeat_timeout_s=10,
                        deadline_s=120, max_restarts=2)
    res = sup.run(ProveJobSpec(program=PROGRAM, max_steps=1 << 10,
                               fault="crash_once"))
    assert res.restarts == 1
    with open(res.proof_path, "rb") as f:
        assert f.read() == reference_bytes()
    # The journal records exactly the successful attempt.
    assert len(res.journal) == 1 and res.journal[0]["attempt"] == 2


def test_hang_detected_by_heartbeat(tmp_path):
    """Frozen worker (SIGSTOP: all threads halt, heartbeat goes stale)
    -> killed by the supervisor on staleness -> restart completes."""
    sup = JobSupervisor(str(tmp_path / "job"), heartbeat_timeout_s=2.0,
                        deadline_s=120, max_restarts=2)
    res = sup.run(ProveJobSpec(program=PROGRAM, max_steps=1 << 10,
                               fault="hang_once"))
    assert res.restarts == 1
    with open(res.proof_path, "rb") as f:
        assert f.read() == reference_bytes()


def test_gives_up_after_max_restarts(tmp_path):
    """A spec that always fails exhausts restarts and raises."""
    job_dir = tmp_path / "job"
    sup = JobSupervisor(str(job_dir), heartbeat_timeout_s=10,
                        deadline_s=120, max_restarts=1)
    # Empty program -> prover raises EmptyTrace -> worker rc != 0 on
    # every attempt.
    with pytest.raises(JobFailed):
        sup.run(ProveJobSpec(program=b"", max_steps=16))


def test_nondeterminism_is_rejected(tmp_path):
    """A forged journal with two digests must fail loudly, not return a
    proof (the purity invariant is enforced, not assumed)."""
    job_dir = tmp_path / "job"
    sup = JobSupervisor(str(job_dir), heartbeat_timeout_s=10,
                        deadline_s=120, max_restarts=0)
    os.makedirs(job_dir, exist_ok=True)
    with open(job_dir / "journal.jsonl", "w") as f:
        f.write(json.dumps({"attempt": 0, "sha256": "deadbeef", "bytes": 1}) + "\n")
    with pytest.raises(JobFailed, match="nondeterministic"):
        sup.run(ProveJobSpec(program=PROGRAM, max_steps=1 << 10))


def test_v2_spec_roundtrip(tmp_path):
    """Protocol v2 jobs run under the supervisor too."""
    sup = JobSupervisor(str(tmp_path / "job"), heartbeat_timeout_s=10,
                        deadline_s=180, max_restarts=0)
    res = sup.run(ProveJobSpec(program=PROGRAM, max_steps=1 << 10,
                               protocol_version=2))
    with open(res.proof_path, "rb") as f:
        assert f.read() == reference_bytes(protocol_version=2)
