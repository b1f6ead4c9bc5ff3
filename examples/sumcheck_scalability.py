"""Sumcheck scaling demo (examples/sumcheck_scalability.zig port, extended):
1..8-var MLEs on host, then 2^16..2^20-var... sizes on device via the
distributed prover — proof size vs naive O(2^v) work, prove time.

BASELINE.md config 2: standalone sumcheck over 2^16-2^20-element MLEs.
"""

import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from zigz_tpu.core.field import BabyBear as F
from zigz_tpu.poly.multilinear import Multilinear
from zigz_tpu.proofs.sumcheck import SumcheckProver


def host_sweep():
    print("host prover (1..8 vars):")
    print(f"{'vars':>5} {'evals':>7} {'proof B':>8} {'time us':>9}")
    rng = np.random.default_rng(0)
    for v in range(1, 9):
        vals = rng.integers(0, F.MODULUS, size=1 << v, dtype=np.uint64)
        poly = Multilinear(F, vals)
        t0 = time.perf_counter()
        proof = SumcheckProver.prove(poly)
        dt = time.perf_counter() - t0
        print(f"{v:>5} {1 << v:>7} {len(proof.to_bytes()):>8} {dt * 1e6:>9.0f}")


def device_sweep(max_v: int = 18):
    from zigz_tpu.parallel.dist import DistSumcheckProver

    print(f"\ndevice prover (12..{max_v} vars):")
    print(f"{'vars':>5} {'evals':>9} {'proof B':>8} {'time ms':>9}")
    rng = np.random.default_rng(0)
    prover = DistSumcheckProver(F)
    for v in range(12, max_v + 1, 2):
        vals = rng.integers(0, F.MODULUS, size=1 << v, dtype=np.uint64)
        t0 = time.perf_counter()
        proof = prover.prove(vals)
        dt = time.perf_counter() - t0
        print(f"{v:>5} {1 << v:>9} {len(proof.to_bytes()):>8} {dt * 1e3:>9.1f}")


if __name__ == "__main__":
    host_sweep()
    if "--device" in sys.argv:
        device_sweep()
