"""Benchmark harness — prints ONE JSON line for the driver.

Primary metric (BASELINE.md): BabyBear field-ops/s/chip + prover wall time.
The headline number is sustained Montgomery-multiply throughput on one chip
(the building block of every MLE fold/eval); the secondary block reports
end-to-end prover throughput (steps/s) at the largest size that is currently
fast enough, with phase timings.

vs_baseline: the reference publishes no measured numbers (BASELINE.md), so
the ratio is against its aspirational target of 1M RISC-V cycles in ~1.5s
(README.md:513) applied to prover steps/s: baseline = 666,667 steps/s.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

ASPIRATIONAL_STEPS_PER_S = 1_000_000 / 1.5


def bench_field_ops(reps: int = 20, size: int = 1 << 22):
    """Sustained mont_mul throughput (ops/s) on the default device."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from zigz_tpu.ops import babybear as bb

    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.integers(0, bb.P, size=size, dtype=np.uint64).astype(np.uint32))
    b = jnp.asarray(rng.integers(0, bb.P, size=size, dtype=np.uint32))

    @jax.jit
    def chain(x, y):
        # 8 dependent multiplies per element to amortize dispatch.
        for _ in range(8):
            x = bb.mont_mul(x, y)
        return x

    out = chain(a, b)
    jax.block_until_ready(out)  # compile + warm
    t0 = time.perf_counter()
    for _ in range(reps):
        out = chain(out, b)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    total_ops = reps * 8 * size
    return total_ops / dt


def bench_prover(num_steps: int):
    """End-to-end prove of a NOP trace; returns (steps/s, timings).  Runs
    twice and reports the warm pass (first-time kernel compiles on the
    axon backend are cached persistently but cold runs pay them)."""
    from zigz_tpu.core.field import BabyBear
    from zigz_tpu.prover.prover import Prover

    program = bytes([0x13, 0x00, 0x00, 0x00] * num_steps)
    prover = Prover(BabyBear, seed=0)
    best = None
    # Up to 4 passes, stopping once a pass is no longer >10% faster than
    # the best so far: on the axon backend per-process executable loading
    # bleeds into the first PASSES (not just the first), so a fixed warm
    # count under-reports steady state at the largest sizes.
    for i in range(4):
        t0 = time.perf_counter()
        proof = prover.prove(program, 0x1000, None, num_steps * 2, None, None)
        dt = time.perf_counter() - t0
        assert proof.metadata.num_steps == num_steps
        if best is not None and dt > 0.9 * best:
            best = min(best, dt)
            break
        best = dt if best is None else min(best, dt)
    return num_steps / best, prover.last_timings


def bench_prover_v2(num_steps: int):
    """Warm prove throughput for protocol v2 (the full self-contained
    RV64IM execution proof: zerocheck + logUp memory/bytecode/lookup
    arguments + Ligero PCS) — far more work per step than the v1
    wire-parity protocol, reported separately."""
    from zigz_tpu.core.field import BabyBear
    from zigz_tpu.prover.prover import Prover

    program = bytes([0x13, 0x00, 0x00, 0x00] * num_steps)
    prover = Prover(BabyBear, seed=0, protocol_version=2)
    best = None
    for _ in range(2):
        t0 = time.perf_counter()
        proof = prover.prove(program, 0x1000, None, num_steps * 2, None, None)
        dt = time.perf_counter() - t0
        assert proof.metadata.num_steps == num_steps
        best = dt if best is None else min(best, dt)
    return num_steps / best


def main():
    from zigz_tpu.utils.profiling import maybe_trace_env

    with maybe_trace_env():
        _main_inner()


def _main_inner():
    field_ops_per_s = bench_field_ops()

    # Prover throughput ladder: walk up while the warm pass stays within
    # budget (protects the driver run against cold-compile stalls).
    steps_per_s, timings = bench_prover(1 << 14)
    for v in (16, 18, 20, 22):
        projected = (1 << v) / steps_per_s
        if projected > 240:
            break
        try:
            steps_per_s, timings = bench_prover(1 << v)
        except Exception:
            break

    try:
        v2_steps_per_s = round(bench_prover_v2(1 << 16))
    except Exception:
        v2_steps_per_s = None

    result = {
        "metric": "babybear_field_ops_per_s_per_chip",
        "value": round(field_ops_per_s),
        "unit": "mont_mul/s",
        "vs_baseline": round(steps_per_s / ASPIRATIONAL_STEPS_PER_S, 4),
        "extra": {
            "prover_steps_per_s": round(steps_per_s),
            "prover_num_steps": timings.get("num_steps"),
            "v2_prover_steps_per_s": v2_steps_per_s,
            "v2_num_steps": 1 << 16,
            "prover_phase_timings_s": {
                k: round(v, 4) for k, v in timings.items() if k.endswith("_s")
            },
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
