"""Weak-scaling harness over the virtual trace-axis mesh (VERDICT round-1
item 8; SURVEY.md §2.11 / BASELINE.md ≥80%-scaling analysis).

The reference is single-process CPU, so there is nothing to scale there;
this harness characterises OUR collective schedule.  On this machine the
mesh is virtual (``--xla_force_host_platform_device_count``), so wall
times share the same physical cores and are NOT a scaling-efficiency
measurement — what IS meaningful and is reported here:

* a **collective census** of the distributed sumcheck, round by round,
  straight from the compiled HLO of each round's two kernels under the
  actual shrinking-axis shardings.  This pins the shard→gather crossover
  (the round where XLA stops emitting collective-permutes for the MSB
  fold and instead gathers the now-tiny axis) and the total bytes moved,
  which together feed the ≥80% target analysis below;
* **weak-scaled end-to-end proves** of the REAL pipeline
  (``Prover(mesh=...)``, fixed per-device trace work) with proof bytes
  asserted identical to the single-device host prover — correctness of
  the schedule at every mesh size, plus wall times for shape (not
  efficiency).

Run:  XLA_FLAGS=--xla_force_host_platform_device_count=8 \
          python scripts/scaling.py [--markdown]
"""

import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax
import jax.numpy as jnp

if "--tpu" not in sys.argv:
    jax.config.update("jax_platforms", "cpu")

import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from zigz_tpu.core.field import BabyBear as F
from zigz_tpu.ops import babybear as bb
from zigz_tpu.ops.mle import fold_msb, round_poly_msb
from zigz_tpu.parallel.dist import DistSumcheckProver, make_trace_mesh
from zigz_tpu.prover.prover import Prover
from zigz_tpu.prover.serialization import BinarySerializer
from zigz_tpu.verifier.verifier import Verifier

_COLLECTIVES = ("all-reduce", "all-gather", "collective-permute",
                "reduce-scatter", "all-to-all")


def _census(fn, arg_shapes, mesh, spec_list):
    """Compile ``fn`` with the given shardings and count collective ops in
    the optimized HLO."""
    shardings = [NamedSharding(mesh, s) for s in spec_list]
    args = [jax.ShapeDtypeStruct(shape, jnp.uint32) for shape in arg_shapes]
    txt = (
        jax.jit(fn, in_shardings=shardings)
        .lower(*args)
        .compile()
        .as_text()
    )
    # Count op definitions only ("= <shape> all-reduce(..."), not operand
    # references to them; also account the bytes each collective moves
    # (product of the result-shape dims x 4 B for u32 lanes).
    out = {c: len(re.findall(rf"= \S+ {c}[.\d]*\(", txt)) for c in _COLLECTIVES}
    nbytes = 0
    for m in re.finditer(
        rf"= \S*?u32\[([\d,]*)\][^ ]* (?:{'|'.join(_COLLECTIVES)})[.\d]*\(", txt
    ):
        dims = m.group(1)
        elems = 1
        for d in dims.split(","):
            if d:
                elems *= int(d)
        nbytes += 4 * elems
    out["bytes"] = nbytes
    return out


def sumcheck_round_census(n_dev: int, v: int):
    """Per-round collective counts for the distributed sumcheck at 2^v."""
    mesh = make_trace_mesh(n_dev)
    rows = []
    size = 1 << v
    for rnd in range(v):
        # Below the device count the axis can no longer be sharded; XLA
        # keeps it replicated from the previous fold — the crossover.
        axis_spec = P("trace") if size >= n_dev else P()
        sums = _census(round_poly_msb, [(size,)], mesh, [axis_spec])
        fold = _census(
            lambda e, r: fold_msb(e, r), [(size,), (1,)], mesh, [axis_spec, P()]
        )
        total = {c: sums[c] + fold[c] for c in (*_COLLECTIVES, "bytes")}
        rows.append((rnd, size, total))
        size //= 2
    return rows


def _arith_program(n_adds: int) -> bytes:
    body = bytes([0x93, 0x00, 0x30, 0x00, 0x13, 0x01, 0x40, 0x00])
    body += bytes([0xB3, 0x81, 0x20, 0x00]) * n_adds
    return body + bytes([0x73, 0x00, 0x10, 0x00])


def weak_scaling_prove(v_per_device: int = 9, version: int = 1):
    """Fixed per-device trace work: mesh n proves a 2^(v_per_device+log2 n)
    step program.  Bytes must match the host prover at every size."""
    ser = BinarySerializer(F)
    rows = []
    for n_dev in (1, 2, 4, 8):
        if n_dev > len(jax.devices()):
            break
        v = v_per_device + n_dev.bit_length() - 1
        program = _arith_program((1 << v) - 3)
        os.environ["ZIGZ_TPU_COMMITMENTS"] = "host"
        try:
            host = ser.serialize(
                Prover(F, seed=0, protocol_version=version).prove(
                    program, 0x1000, None, 1 << (v + 1), None, None
                )
            )
        finally:
            del os.environ["ZIGZ_TPU_COMMITMENTS"]
        mesh = make_trace_mesh(n_dev)
        prover = Prover(F, seed=0, protocol_version=version, mesh=mesh)
        proof = prover.prove(program, 0x1000, None, 1 << (v + 1), None, None)  # warm
        t0 = time.perf_counter()
        proof = prover.prove(program, 0x1000, None, 1 << (v + 1), None, None)
        dt = time.perf_counter() - t0
        data = ser.serialize(proof)
        assert data == host, f"mesh={n_dev}: sharded proof bytes diverged"
        assert Verifier(F).verify(proof, program) == "Accept"
        rows.append((n_dev, v, dt))
    return rows


def main():
    md = "--markdown" in sys.argv
    n_avail = len(jax.devices())
    print(f"devices: {n_avail} ({jax.default_backend()})")

    # --- Part A: round-by-round collective census (8-way mesh, 2^16) ----
    v = 16
    print(f"\n## Distributed sumcheck collective census (8-way mesh, 2^{v})\n")
    print("| round | axis size | all-reduce | collective-permute | all-gather | bytes |")
    print("|---|---|---|---|---|---|")
    crossover = None
    for rnd, size, c in sumcheck_round_census(min(8, n_avail), v):
        if crossover is None and c["collective-permute"] == 0 and c["all-gather"] == 0 \
                and c["all-reduce"] == 0 and rnd > 0:
            crossover = rnd
        print(f"| {rnd} | 2^{size.bit_length() - 1} "
              f"| {c['all-reduce']} | {c['collective-permute']} | {c['all-gather']} "
              f"| {c['bytes']} |")
    if crossover is not None:
        print(f"\nshard→gather crossover: round {crossover} "
              f"(axis ≤ device count → XLA keeps the tail replicated; "
              f"no further collectives)")

    # --- Part B: total collectives per mesh size ------------------------
    print("\n## Total sumcheck collectives by mesh size (2^16 MLE)\n")
    print("| mesh | all-reduce | collective-permute | all-gather | total bytes |")
    print("|---|---|---|---|---|")
    for n_dev in (1, 2, 4, 8):
        if n_dev > n_avail:
            break
        tot = {c: 0 for c in (*_COLLECTIVES, "bytes")}
        for _rnd, _size, c in sumcheck_round_census(n_dev, v):
            for k in tot:
                tot[k] += c[k]
        print(f"| {n_dev} | {tot['all-reduce']} | {tot['collective-permute']} "
              f"| {tot['all-gather']} | {tot['bytes']} |")

    # --- Part C: weak-scaled real prover --------------------------------
    print("\n## Weak-scaled end-to-end prover (fixed per-device work; "
          "virtual mesh → wall times are shape only)\n")
    print("| mesh | steps | prove_s | bytes == host |")
    print("|---|---|---|---|")
    for n_dev, vv, dt in weak_scaling_prove():
        print(f"| {n_dev} | 2^{vv} | {dt:.2f} | yes |")
    if not md:
        print("\nbit-exactness asserted at every row (host vs sharded bytes).")


if __name__ == "__main__":
    main()
