"""Multichip dryrun robustness under host load (round-4 verdict weak #1).

The round-4 driver artifact failed with an XLA CPU all-gather rendezvous
abort: 8 virtual devices on 4 cores, deep async collective queues, and a
40 s termination window — one participant starved past the window while
the host was busy and the process died (rc 134).  The fixes under test:

* ``__graft_entry__._force_cpu_if_needed`` raises
  ``xla_cpu_collective_call_terminate_timeout_seconds`` (the rendezvous
  abort window) to 600 s on virtual CPU meshes;
* ``commitments/device_forest._build_forest_lo`` syncs every merge level
  on CPU backends so per-device queues cannot skew.

This test reproduces the failure condition deliberately: it saturates
every core with burner processes, then runs the REAL
``dryrun_multichip(8)`` in a subprocess and requires a clean exit.  A
regression to the 40 s window or to unbounded queue skew shows up as
rc 134 here, not in the driver artifact.
"""

import os
import subprocess
import sys
import time

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow  # several minutes: full 2^14-step dryrun on saturated cores
def test_dryrun_multichip_survives_cpu_saturation():
    ncpu = os.cpu_count() or 4
    burner_src = (
        "import time\n"
        "t = time.time()\n"
        "x = 0\n"
        "while time.time() - t < 900:\n"
        "    x = x * 3 + 1\n"
    )
    burners = [
        subprocess.Popen([sys.executable, "-c", burner_src])
        for _ in range(ncpu)
    ]
    try:
        env = dict(os.environ)
        # Fresh env for the subprocess: the dryrun injects its own XLA
        # flags (virtual device count + rendezvous timeout).
        env.pop("XLA_FLAGS", None)
        env.pop("JAX_PLATFORMS", None)
        t0 = time.time()
        proc = subprocess.run(
            [
                sys.executable,
                "-c",
                "import __graft_entry__; __graft_entry__.dryrun_multichip(8)",
            ],
            cwd=REPO,
            env=env,
            capture_output=True,
            text=True,
            timeout=900,
        )
        elapsed = time.time() - t0
        assert proc.returncode == 0, (
            f"dryrun under load failed rc={proc.returncode} after "
            f"{elapsed:.0f}s\nstdout tail: {proc.stdout[-2000:]}\n"
            f"stderr tail: {proc.stderr[-2000:]}"
        )
        assert "dryrun_multichip OK" in proc.stdout
    finally:
        for b in burners:
            b.kill()
        for b in burners:
            b.wait()
