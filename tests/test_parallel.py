"""Multi-device sharding tests on the virtual 8-device CPU mesh
(SURVEY.md §4 multi-node strategy): distributed sumcheck must be bit-exact
vs the host prover, and the fused pipeline step must compile and run under
a real trace-axis sharding."""

import jax
import jax.numpy as jnp
import numpy as np

from zigz_tpu.core.field import BabyBear as F
from zigz_tpu.ops import babybear as bb
from zigz_tpu.parallel.dist import (
    DistSumcheckProver,
    device_prove_step,
    make_trace_mesh,
    shard_rows,
)
from zigz_tpu.poly.multilinear import Multilinear
from zigz_tpu.proofs.sumcheck import SumcheckProver

rng = np.random.default_rng(7)


def test_virtual_mesh_present():
    assert len(jax.devices()) == 8


def _host_proof(vals):
    return SumcheckProver.prove(Multilinear(F, vals.copy()))


def _assert_proofs_equal(a, b):
    assert a.num_vars == b.num_vars
    for pa, pb in zip(a.round_polynomials, b.round_polynomials):
        assert [c.value for c in pa] == [c.value for c in pb]
    assert [c.value for c in a.final_point] == [c.value for c in b.final_point]
    assert a.final_eval.value == b.final_eval.value


def test_dist_sumcheck_single_device_bit_exact():
    vals = rng.integers(0, bb.P, size=1 << 8, dtype=np.uint64)
    host = _host_proof(vals)
    dev = DistSumcheckProver(F, mesh=None).prove(vals)
    _assert_proofs_equal(host, dev)


def test_dist_sumcheck_sharded_bit_exact():
    mesh = make_trace_mesh(8)
    vals = rng.integers(0, bb.P, size=1 << 10, dtype=np.uint64)
    host = _host_proof(vals)
    dev = DistSumcheckProver(F, mesh=mesh).prove(vals)
    _assert_proofs_equal(host, dev)
    assert dev.to_bytes() == host.to_bytes()


def test_device_prove_step_sharded():
    mesh = make_trace_mesh(8)
    B, v = 43, 8
    matrix = rng.integers(0, bb.P, size=(B, 1 << v), dtype=np.uint64)
    points = rng.integers(0, bb.P, size=(B, v), dtype=np.uint64)
    r = rng.integers(0, bb.P, size=1, dtype=np.uint64)

    matrix_m = shard_rows(mesh, jnp.asarray(bb.np_to_mont(matrix)))
    points_m = jnp.asarray(bb.np_to_mont(points))
    r_m = jnp.asarray(bb.np_to_mont(r))

    evals, g0, g1, folded = device_prove_step(matrix_m, points_m, r_m)

    # Cross-check every output against the exact host implementation.
    evals_c = np.asarray(bb.from_mont(evals), dtype=np.uint64)
    g0_c = np.asarray(bb.from_mont(g0), dtype=np.uint64)
    g1_c = np.asarray(bb.from_mont(g1), dtype=np.uint64)
    folded_c = np.asarray(bb.from_mont(folded), dtype=np.uint64)

    half = 1 << (v - 1)
    for i in range(B):
        poly = Multilinear(F, matrix[i].copy())
        pt = [F.from_reduced(int(x)) for x in points[i]]
        assert int(evals_c[i]) == poly.eval(pt).value
        assert int(g0_c[i]) == int(matrix[i][:half].sum()) % bb.P
        assert int(g1_c[i]) == int(matrix[i][half:].sum()) % bb.P
        host_folded = poly.partial_eval(F.from_reduced(int(r[0])))
        np.testing.assert_array_equal(folded_c[i], host_folded.evals)


def test_shard_rows_layout():
    mesh = make_trace_mesh(8)
    x = jnp.zeros((43, 256), dtype=jnp.uint32)
    xs = shard_rows(mesh, x)
    # trailing axis split 8 ways
    shard_shapes = {s.data.shape for s in xs.addressable_shards}
    assert shard_shapes == {(43, 32)}
