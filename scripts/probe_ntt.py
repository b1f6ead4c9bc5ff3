"""Probe: device NTT (ops/ntt_dev) vs threaded C++ NTT (runtime/ntt.cpp)
at the matrix shapes the v2/v4 Ligero commitments actually use."""

import sys, time, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

print("backend:", jax.default_backend())

from zigz_tpu.commitments.ligero import ntt_pow2_u32
from zigz_tpu.ops.ntt_dev import encode_rows_device

rng = np.random.default_rng(0)
P = 2013265921

# (rows, n, n_out): v4 witness at 2^20 (43 cols, cn=16); regcheck-ish v2.
shapes = [
    (43 * 16, 1 << 16, 1 << 18),
    (40 * 64, 1 << 14, 1 << 16),
    (43 * 64, 1 << 16, 1 << 18),  # v4 at 2^22
]

for rows, n, n_out in shapes:
    mat = rng.integers(0, P, size=(rows, n), dtype=np.uint64)

    t0 = time.perf_counter()
    host = ntt_pow2_u32(mat, n_out)
    t_host = time.perf_counter() - t0

    # Warm (compile)
    dev = encode_rows_device(mat, n_out)
    jax.block_until_ready(dev)
    t0 = time.perf_counter()
    dev = encode_rows_device(mat, n_out)
    jax.block_until_ready(dev)
    t_dev = time.perf_counter() - t0
    t0 = time.perf_counter()
    dev_np = np.asarray(dev)
    t_xfer = time.perf_counter() - t0

    ok = np.array_equal(dev_np.astype(np.uint32), host)
    print(f"rows={rows} n={n} n_out={n_out}: host={t_host:.3f}s "
          f"dev={t_dev:.3f}s xfer={t_xfer:.3f}s equal={ok}")
