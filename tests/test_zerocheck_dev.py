"""Device zerocheck must produce bit-identical proofs to the host
ZerocheckProver — same round evaluations, challenges, terminal column
evals — single-device and on the 8-device mesh.

Columns are the full 6-constraint v2 system (constraints/v2.py): the four
execution constraints plus the PC-chain logUp inverse constraints, with
the public index/selector rows built on device."""

import numpy as np

from zigz_tpu.core.field import BabyBear as F
from zigz_tpu.core.hash import FiatShamirTranscript
from zigz_tpu.constraints.v2 import (
    NUM_V2_ALPHAS,
    V2_DEGREE,
    build_logup_columns,
    logup_public_tables,
    make_v2_combiner,
)
from zigz_tpu.ops.zerocheck_dev import DeviceZerocheckProver, eq_table_device
from zigz_tpu.ops import babybear as bb
from zigz_tpu.parallel.dist import make_trace_mesh
from zigz_tpu.proofs.zerocheck import ZerocheckProver, _eq_table

rng = np.random.default_rng(23)

TAU, BETA = 123456789, 987654321


def _random_v2_columns(n):
    # Satisfying columns (so the zerocheck is a realistic all-zero sum):
    # x0 = 0, is_read/seq boolean, a CONSISTENT pc chain (pc(x+1) ==
    # next_pc(x)) so the logUp inverse columns exist, next_pc = pc + 4
    # wherever seq = 1.
    num_steps = n - rng.integers(0, n // 4)
    pc = np.zeros(n, dtype=np.uint64)
    next_pc = np.zeros(n, dtype=np.uint64)
    seq = rng.integers(0, 2, size=n, dtype=np.uint64)
    cur = 0x1000
    for i in range(n):
        pc[i] = cur
        nxt = cur + 4 if seq[i] == 1 else int(rng.integers(0, 1 << 20)) * 4
        next_pc[i] = nxt
        cur = nxt
    cols = {
        "x0": np.zeros(n, dtype=np.uint64),
        "is_read": rng.integers(0, 2, size=n, dtype=np.uint64),
        "pc": pc,
        "seq": seq,
        "next_pc": next_pc,
    }
    g1, g2, _ = build_logup_columns(
        pc, next_pc, num_steps, n.bit_length() - 1, TAU, BETA, bb.P
    )
    cols["g1"] = g1
    cols["g2"] = g2
    return cols, int(num_steps)


def _prove_host(cols, num_steps, n):
    full = dict(cols)
    full.update(logup_public_tables(num_steps, n.bit_length() - 1, bb.P))
    return ZerocheckProver(
        F, full, make_v2_combiner(TAU, BETA), V2_DEGREE, num_alphas=NUM_V2_ALPHAS
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
    n = 1 << 9
    cols, num_steps = _random_v2_columns(n)
    host = _prove_host(cols, num_steps, n)
    dev = DeviceZerocheckProver(
        F, cols, V2_DEGREE, NUM_V2_ALPHAS, num_steps, TAU, BETA
    ).prove(FiatShamirTranscript())
    _assert_equal(host, dev)


def test_device_zerocheck_bit_equal_large_crosses_host_tail():
    # Width > HOST_TAIL so device rounds run before the host handoff.
    import zigz_tpu.ops.zerocheck_dev as zd

    n = 1 << 14
    assert n > zd.HOST_TAIL
    cols, num_steps = _random_v2_columns(n)
    host = _prove_host(cols, num_steps, n)
    dev = DeviceZerocheckProver(
        F, cols, V2_DEGREE, NUM_V2_ALPHAS, num_steps, TAU, BETA
    ).prove(FiatShamirTranscript())
    _assert_equal(host, dev)


def test_device_zerocheck_sharded_bit_equal():
    mesh = make_trace_mesh(8)
    n = 1 << 14
    cols, num_steps = _random_v2_columns(n)
    host = _prove_host(cols, num_steps, n)
    dev = DeviceZerocheckProver(
        F, cols, V2_DEGREE, NUM_V2_ALPHAS, num_steps, TAU, BETA, mesh=mesh
    ).prove(FiatShamirTranscript())
    _assert_equal(host, dev)
