"""Observability: phase timers + jax.profiler integration.

The reference's only timing is ad-hoc millisecond stamps around
prove/verify (SURVEY.md §5); the TPU equivalent is structured phase
timing (Prover.last_timings) plus on-demand device traces viewable in
TensorBoard/XProf.

Usage:
    from zigz_tpu.utils.profiling import device_trace, PhaseTimer

    with device_trace("/tmp/zigz-trace"):      # jax.profiler trace
        prover.prove(...)

    t = PhaseTimer()
    with t.phase("witness"):
        ...
    print(t.report())

Set ZIGZ_TPU_TRACE=<dir> to trace any bench.py run.
"""

from __future__ import annotations

import contextlib
import os
import time
from typing import Dict

__all__ = ["device_trace", "PhaseTimer", "maybe_trace_env"]


@contextlib.contextmanager
def device_trace(log_dir: str):
    """jax.profiler trace context (works on TPU and CPU backends)."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def maybe_trace_env():
    """Trace into $ZIGZ_TPU_TRACE when set; no-op otherwise."""
    log_dir = os.environ.get("ZIGZ_TPU_TRACE")
    if not log_dir:
        yield None
        return
    with device_trace(log_dir):
        yield log_dir


class PhaseTimer:
    """Named phase timing with nesting-free accumulation."""

    def __init__(self):
        self.timings: Dict[str, float] = {}

    @contextlib.contextmanager
    def phase(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.timings[name] = self.timings.get(name, 0.0) + time.perf_counter() - t0

    def report(self) -> str:
        total = sum(self.timings.values())
        lines = [f"{name:<20}{dt * 1e3:10.2f} ms" for name, dt in self.timings.items()]
        lines.append(f"{'total':<20}{total * 1e3:10.2f} ms")
        return "\n".join(lines)
