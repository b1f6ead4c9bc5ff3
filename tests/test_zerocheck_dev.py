"""Device zerocheck must produce bit-identical proofs to the host
ZerocheckProver — same round evaluations, challenges, terminal column
evals — single-device and on the 8-device mesh."""

import numpy as np

from zigz_tpu.core.field import BabyBear as F
from zigz_tpu.core.hash import FiatShamirTranscript
from zigz_tpu.constraints.v2 import NUM_V2_CONSTRAINTS, V2_DEGREE, v2_combiner
from zigz_tpu.ops.zerocheck_dev import DeviceZerocheckProver, V2_ROW_ORDER, eq_table_device
from zigz_tpu.ops import babybear as bb
from zigz_tpu.parallel.dist import make_trace_mesh
from zigz_tpu.proofs.zerocheck import ZerocheckProver, _eq_table

rng = np.random.default_rng(23)


def _random_v2_columns(n):
    # Satisfying columns (so the zerocheck is a realistic all-zero sum):
    # x0 = 0, is_read/seq boolean, next_pc = pc + 4 wherever seq = 1.
    pc = rng.integers(0, bb.P - 4, size=n, dtype=np.uint64)
    seq = rng.integers(0, 2, size=n, dtype=np.uint64)
    next_pc = np.where(seq == 1, pc + 4, rng.integers(0, bb.P, size=n, dtype=np.uint64))
    return {
        "x0": np.zeros(n, dtype=np.uint64),
        "is_read": rng.integers(0, 2, size=n, dtype=np.uint64),
        "pc": pc,
        "seq": seq,
        "next_pc": next_pc % np.uint64(bb.P),
    }


def _prove_host(cols):
    return ZerocheckProver(
        F, cols, v2_combiner, V2_DEGREE, num_alphas=NUM_V2_CONSTRAINTS
    ).prove(FiatShamirTranscript())


def _assert_equal(a, b):
    assert a.round_evals == b.round_evals
    assert a.final_point == b.final_point
    assert a.column_evals == b.column_evals


def test_eq_table_device_matches_host():
    taus = [int(x) for x in rng.integers(0, bb.P, size=6)]
    host = _eq_table(taus, bb.P)
    dev = np.asarray(bb.from_mont(eq_table_device(taus, 1 << 6)), dtype=np.uint64)
    np.testing.assert_array_equal(host, dev)


def test_device_zerocheck_bit_equal():
    cols = _random_v2_columns(1 << 9)
    host = _prove_host(cols)
    dev = DeviceZerocheckProver(F, cols, V2_DEGREE, NUM_V2_CONSTRAINTS).prove(
        FiatShamirTranscript()
    )
    _assert_equal(host, dev)


def test_device_zerocheck_bit_equal_large_crosses_host_tail():
    # Width > HOST_TAIL so device rounds run before the host handoff.
    import zigz_tpu.ops.zerocheck_dev as zd

    n = 1 << 14
    assert n > zd.HOST_TAIL
    cols = _random_v2_columns(n)
    host = _prove_host(cols)
    dev = DeviceZerocheckProver(F, cols, V2_DEGREE, NUM_V2_CONSTRAINTS).prove(
        FiatShamirTranscript()
    )
    _assert_equal(host, dev)


def test_device_zerocheck_sharded_bit_equal():
    mesh = make_trace_mesh(8)
    cols = _random_v2_columns(1 << 14)
    host = _prove_host(cols)
    dev = DeviceZerocheckProver(F, cols, V2_DEGREE, NUM_V2_CONSTRAINTS, mesh=mesh).prove(
        FiatShamirTranscript()
    )
    _assert_equal(host, dev)
