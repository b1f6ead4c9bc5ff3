"""Per-phase collective census for a sharded v2 prove (round-5, verdict
weak #7): run a REAL >= 2^16-step v2 prove on the 8-device virtual CPU
mesh with XLA HLO dumping on, then count the collectives each compiled
module emits, grouped by the (distinctively named) phase entry points:

  ligero_mesh_commit   — DATA/ADVICE commit (row-sharded NTT encode,
                         one all-to-all to the column sharding, local
                         SHA3 sponge)
  ligero_mesh_gather   — opened-column gather at OPEN
  batch_eval_mesh_step — fused fold + round sums of the batch-eval
                         reduction (psum / collective-permute)
  _ext_prod_sums       — batch-eval round 0 (sums only)
  everything else      — v1 forest/witness/sumcheck modules (already
                         censused in docs/COMPARISON.md)

Usage:  python scripts/v2_census.py [log2_steps]
Writes a markdown table to stdout; paste into docs/COMPARISON.md.
"""

import os
import re
import sys
import tempfile
import time

DUMP = tempfile.mkdtemp(prefix="zigz_census_")
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + f" --xla_force_host_platform_device_count=8 --xla_dump_to={DUMP}"
).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_cpu_enable_async_dispatch", False)

COLLECTIVES = ("all-reduce", "all-gather", "all-to-all", "collective-permute")


def main():
    import numpy as np  # noqa: F401

    from zigz_tpu.core.field import BabyBear as F
    from zigz_tpu.parallel.dist import make_trace_mesh
    from zigz_tpu.prover.prover import Prover

    v = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    n_steps = 1 << v
    program = (
        bytes([0x93, 0x00, 0x30, 0x00, 0x13, 0x01, 0x40, 0x00])
        + bytes([0xB3, 0x81, 0x20, 0x00]) * (n_steps - 3)
        + bytes([0x73, 0x00, 0x10, 0x00])
    )
    mesh = make_trace_mesh(8)
    prover = Prover(F, seed=0, protocol_version=2, mesh=mesh)
    t0 = time.perf_counter()
    proof = prover.prove(program, 0x1000, None, n_steps * 2, None, None)
    wall = time.perf_counter() - t0
    assert proof.metadata.num_steps == n_steps
    timings = {
        k: (round(x, 2) if isinstance(x, float) else x)
        for k, x in prover.last_timings.items()
        if k.endswith("_s") or "sharded" in k
    }

    # Parse the after-optimization HLO dumps: per jit-module collective
    # instruction counts (each module compiles once; executions reuse it).
    per_mod = {}
    for fname in sorted(os.listdir(DUMP)):
        if "after_optimizations" not in fname or not fname.endswith(".txt"):
            continue
        m = re.match(r"module_\d+\.(jit_?[A-Za-z0-9_]*)\.", fname)
        name = m.group(1) if m else fname
        counts = per_mod.setdefault(name, dict.fromkeys(COLLECTIVES, 0))
        with open(os.path.join(DUMP, fname)) as f:
            for line in f:
                ls = line.lstrip()
                if "=" not in ls:
                    continue
                rhs = ls.split("=", 1)[1].lstrip()
                op = rhs.split("(", 1)[0].split(" ")[-1]
                for c in COLLECTIVES:
                    if op == c or op == c + "-start":
                        counts[c] += 1

    print(f"\nv2 sharded prove: 2^{v} steps, 8-device mesh, {wall:.1f} s "
          f"(virtual CPU; compile-dominated)")
    print(f"phase timings: {timings}\n")
    print("| module | all-reduce | all-gather | all-to-all | collective-permute |")
    print("|---|---|---|---|---|")
    interesting = []
    other = dict.fromkeys(COLLECTIVES, 0)
    for name, counts in sorted(per_mod.items()):
        if any(counts.values()):
            if any(tag in name for tag in (
                "ligero_mesh_commit", "ligero_mesh_gather",
                "batch_eval_mesh_step", "_ext_prod_sums",
            )):
                interesting.append((name, counts))
            else:
                for c in COLLECTIVES:
                    other[c] += counts[c]
    for name, counts in interesting:
        print(f"| {name} | " + " | ".join(str(counts[c]) for c in COLLECTIVES)
              + " |")
    print("| (v1 forest / witness / sumcheck / lasso modules, total) | "
          + " | ".join(str(other[c]) for c in COLLECTIVES) + " |")
    print(f"\nHLO dump dir: {DUMP}")


if __name__ == "__main__":
    main()
