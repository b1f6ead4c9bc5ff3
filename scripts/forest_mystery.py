"""One-process TPU experiment: the round-1 forest-perf mystery.

Round-1 finding (docs/COMPARISON.md + memory): the Pallas Keccak kernel
measures 4-7 GHash/s standalone and an inline replica of the forest-build
statements once completed 2^22 in 0.11s, yet DeviceMerkleForest's
constructor takes ~9-10s warm.  Suspected time-varying tunnel/device
throughput.  This script interleaves A (ctor) and B (inline replica) twice
each in ONE process, then benchmarks Poseidon2 vs Keccak merge throughput
for the v3 commitment decision.

Run on the real TPU:  python scripts/forest_mystery.py [v]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

v = int(sys.argv[1]) if len(sys.argv) > 1 else 22

import jax
import jax.numpy as jnp

from zigz_tpu.core.field import BabyBear as F
from zigz_tpu.ops import keccak
import zigz_tpu.commitments.device_forest as df

print(f"backend: {jax.default_backend()}, devices: {len(jax.devices())}")

B, N = 43, 1 << v
rng = np.random.default_rng(0)
lo_host = rng.integers(0, 2013265921, size=(B, N), dtype=np.uint32)

t0 = time.perf_counter()
lo = jnp.asarray(lo_host)
lo.block_until_ready()
print(f"transfer (B,N)=({B},{N}) u32: {time.perf_counter()-t0:.2f}s")


def run_ctor(tag):
    t0 = time.perf_counter()
    forest = df.DeviceMerkleForest(F, lo=lo)
    roots = forest.roots()
    dt = time.perf_counter() - t0
    print(f"[{tag}] ctor+roots: {dt:.3f}s")
    for lvl in forest.levels:
        lvl.delete()
    return dt


def run_inline(tag):
    """Inline replica of _build_forest grouped build."""
    t0 = time.perf_counter()
    levels, D = df._build_forest(lo, df.DISCARD_DIGESTS)
    top = keccak.digests_to_bytes(levels[-1])
    from zigz_tpu.commitments.merkle import batch_merge_hashes

    while len(top) // 32 > B:
        top = batch_merge_hashes(top)
    dt = time.perf_counter() - t0
    print(f"[{tag}] inline build+top: {dt:.3f}s")
    for lvl in levels:
        lvl.delete()
    return dt


# Interleave twice each.
ctor1 = run_ctor("A1")
inline1 = run_inline("B1")
ctor2 = run_ctor("A2")
inline2 = run_inline("B2")

# If the ctor is slow while inline is fast in the SAME process, profile one.
if ctor2 > 3 * inline2 and ctor2 > 2.0:
    print("profiling a slow ctor to /tmp/forest_prof ...")
    with jax.profiler.trace("/tmp/forest_prof"):
        run_ctor("A3-profiled")

# --- raw kernel throughputs --------------------------------------------
def bench_hash(fn, arg, n_hashes, tag, reps=3):
    out = fn(arg)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(arg)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / reps
    print(f"[{tag}] {n_hashes/dt/1e6:.0f} MHash/s  ({dt*1e3:.1f} ms per call)")


n = 1 << 22
vals32 = jnp.asarray(rng.integers(0, 2013265921, size=n, dtype=np.uint32))
zeros = jnp.zeros_like(vals32)
bench_hash(lambda x: keccak.sha3_leaves_device(x, zeros), vals32, n, "keccak leaves 2^22")

leaves = keccak.sha3_leaves_device(vals32, zeros)
leaves.block_until_ready()
bench_hash(keccak.sha3_merge, leaves, n // 2, "keccak merge 2^22->2^21")

from zigz_tpu.ops import poseidon2 as p2

bench_hash(p2.p2_leaves, vals32, n, "poseidon2 leaves 2^22")
p2l = p2.p2_leaves(vals32)
p2l.block_until_ready()
bench_hash(p2.p2_merge, p2l, n // 2, "poseidon2 merge 2^22->2^21")

print("done")
