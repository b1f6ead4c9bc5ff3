"""Trace-axis scaling harness (BASELINE.md config ladder, multi-chip leg).

Measures the distributed sumcheck prover across mesh sizes.  On this
machine the mesh is virtual (CPU devices), which validates the collective
schedule and measures overhead shape, not ICI bandwidth — run on a real
TPU slice for scaling-efficiency numbers.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax

if "--tpu" not in sys.argv:
    jax.config.update("jax_platforms", "cpu")

import numpy as np

from zigz_tpu.core.field import BabyBear as F
from zigz_tpu.ops import babybear as bb
from zigz_tpu.parallel.dist import DistSumcheckProver, make_trace_mesh


def main(v: int = 16):
    rng = np.random.default_rng(0)
    vals = rng.integers(0, bb.P, size=1 << v, dtype=np.uint64)

    print(f"devices: {len(jax.devices())} ({jax.default_backend()}); MLE 2^{v}")
    print(f"{'mesh':>6} {'prove_s':>9} {'speedup':>8}")
    base = None
    reference_proof = None
    for n_dev in (1, 2, 4, 8):
        if n_dev > len(jax.devices()):
            break
        mesh = make_trace_mesh(n_dev) if n_dev > 1 else None
        prover = DistSumcheckProver(F, mesh=mesh)
        prover.prove(vals)  # warm / compile
        t0 = time.perf_counter()
        proof = prover.prove(vals)
        dt = time.perf_counter() - t0
        if base is None:
            base = dt
            reference_proof = proof.to_bytes()
        else:
            # Sharded result must stay bit-exact.
            assert proof.to_bytes() == reference_proof, "sharded proof mismatch!"
        print(f"{n_dev:>6} {dt:>9.3f} {base / dt:>8.2f}x")


if __name__ == "__main__":
    v = int(sys.argv[1]) if len(sys.argv) > 1 and sys.argv[1].isdigit() else 16
    main(v)
