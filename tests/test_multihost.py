"""Two-process jax.distributed (DCN) tests — SURVEY.md §2.11 "ICI/DCN
backend", exercised for real.

Each test spawns two local worker processes (tests/multihost_worker.py),
each owning 4 virtual CPU devices, joined into one 8-device global mesh
by jax.distributed against a localhost coordinator.  The workers run a
genuine cross-process collective AND the real sharded v2 prove
(``Prover(mesh=global_mesh)``); the Gloo backend carries the psums
between the processes — the same code path DCN takes between TPU hosts.

The restart test injects a SIGKILL host loss into process 1 and checks
the documented failure policy end-to-end: fail fast (the survivor is
killed by exact PID, never by pattern), relaunch the whole job, and the
restarted job's proof bytes equal the reference — the byte-identical
restart invariant of parallel/recovery.py, across processes.
"""

import hashlib
import json
import os
import signal
import socket
import subprocess
import sys
import time

import pytest

HERE = os.path.dirname(os.path.abspath(__file__))
WORKER = os.path.join(HERE, "multihost_worker.py")
TIMEOUT_S = 240


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _launch(tmp_path, fault: str = ""):
    """Spawn the 2-process job; returns (procs, result paths)."""
    port = _free_port()
    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    env.pop("JAX_PLATFORMS", None)  # worker pins cpu via jax.config
    env["PYTHONPATH"] = os.path.dirname(HERE) + os.pathsep + env.get("PYTHONPATH", "")
    if fault:
        env["ZIGZ_MH_FAULT"] = fault
    else:
        env.pop("ZIGZ_MH_FAULT", None)
    results = [str(tmp_path / f"result_{fault or 'ok'}_{i}.json") for i in range(2)]
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, str(port), str(i), results[i]],
            env=env, stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
        )
        for i in range(2)
    ]
    return procs, results


def _wait_all(procs, deadline_s: float):
    deadline = time.monotonic() + deadline_s
    for p in procs:
        left = max(1.0, deadline - time.monotonic())
        try:
            p.wait(timeout=left)
        except subprocess.TimeoutExpired:
            for q in procs:
                if q.poll() is None:
                    q.kill()  # exact PID we spawned — never a pattern
                    q.wait()
            return False
    return all(p.returncode == 0 for p in procs)


def _reference_sha() -> str:
    """Host-path (unsharded, single-process) proof bytes for the worker's
    program — the sharded global-mesh prove must match them exactly."""
    from zigz_tpu.core.field import BabyBear
    from zigz_tpu.prover.prover import Prover
    from zigz_tpu.prover.serialization import BinarySerializer

    program = bytes([0x13, 0x00, 0x00, 0x00] * 128)
    proof = Prover(BabyBear, seed=0, protocol_version=2).prove(
        program, 0x1000, None, 1 << 9, None, None
    )
    return hashlib.sha256(BinarySerializer(BabyBear).serialize(proof)).hexdigest()


def test_two_process_global_mesh_prove_byte_identical(tmp_path):
    procs, results = _launch(tmp_path)
    assert _wait_all(procs, TIMEOUT_S), (
        f"workers failed: rcs={[p.returncode for p in procs]}"
    )
    datas = []
    for path in results:
        with open(path) as f:
            datas.append(json.load(f))
    for d in datas:
        assert d["num_devices"] == 8
        assert d["num_processes"] == 2
        assert d["collective_ok"]
    assert datas[0]["sha256"] == datas[1]["sha256"]
    # The DCN-sharded proof is byte-identical to the single-process one.
    assert datas[0]["sha256"] == _reference_sha()


def test_two_process_killed_worker_fail_fast_restart(tmp_path):
    # Attempt 1: process 1 suffers a simulated host loss (SIGKILL).  The
    # job must fail fast — no partial result files, survivor killed by
    # exact PID — and a clean relaunch must produce the reference bytes.
    procs, results = _launch(tmp_path, fault="sigkill")
    # The faulted worker dies immediately after init.
    procs[1].wait(timeout=120)
    assert procs[1].returncode not in (0, None)
    # Fail fast: kill the survivor by its exact PID.
    if procs[0].poll() is None:
        procs[0].send_signal(signal.SIGKILL)
        procs[0].wait()
    assert not any(os.path.exists(p) for p in results), "partial results leaked"

    # Deterministic restart: relaunch the whole job without the fault.
    procs2, results2 = _launch(tmp_path)
    assert _wait_all(procs2, TIMEOUT_S)
    shas = set()
    for path in results2:
        with open(path) as f:
            shas.add(json.load(f)["sha256"])
    assert shas == {_reference_sha()}
