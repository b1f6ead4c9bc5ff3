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


def _arith_program(n_adds):
    # ADDI x1,x0,3; ADDI x2,x0,4; then n_adds x ADD x3,x1,x2; EBREAK.
    body = bytes([0x93, 0x00, 0x30, 0x00, 0x13, 0x01, 0x40, 0x00])
    body += bytes([0xB3, 0x81, 0x20, 0x00]) * n_adds
    return body + bytes([0x73, 0x00, 0x10, 0x00])


def test_end_to_end_prover_sharded_byte_identical(monkeypatch):
    """THE multi-chip gate: the REAL pipeline (witness build -> Merkle
    forest -> opening evals -> openings) proved on the 8-device mesh must
    produce byte-identical proofs to the single-device host prover, and
    the verifier must accept them (SURVEY.md §2.11 rows 1/4/5)."""
    from zigz_tpu.prover.prover import Prover
    from zigz_tpu.prover.serialization import BinarySerializer
    from zigz_tpu.verifier.verifier import Verifier

    program = _arith_program(125)  # 128 steps -> v=7
    ser = BinarySerializer(F)

    monkeypatch.setenv("ZIGZ_TPU_COMMITMENTS", "host")
    host_bytes = ser.serialize(Prover(F, seed=0).prove(program, 0x1000, None, 1 << 10, None, None))

    monkeypatch.delenv("ZIGZ_TPU_COMMITMENTS", raising=False)
    mesh = make_trace_mesh(8)
    proof = Prover(F, seed=0, mesh=mesh).prove(program, 0x1000, None, 1 << 10, None, None)
    sharded_bytes = ser.serialize(proof)

    assert sharded_bytes == host_bytes
    assert Verifier(F).verify(proof, program) == "Accept"


def test_end_to_end_prover_sharded_v2(monkeypatch):
    """Same gate for protocol v2 (real zerocheck + real Lasso): sharded
    aux forests and witness commitments, byte-identical output."""
    from zigz_tpu.prover.prover import Prover
    from zigz_tpu.prover.serialization import BinarySerializer
    from zigz_tpu.verifier.verifier import Verifier

    program = _arith_program(60)  # 63 steps -> v=6
    ser = BinarySerializer(F)

    monkeypatch.setenv("ZIGZ_TPU_COMMITMENTS", "host")
    host_bytes = ser.serialize(
        Prover(F, seed=0, protocol_version=2).prove(program, 0x1000, None, 1 << 10, None, None)
    )

    monkeypatch.delenv("ZIGZ_TPU_COMMITMENTS", raising=False)
    mesh = make_trace_mesh(8)
    proof = Prover(F, seed=0, protocol_version=2, mesh=mesh).prove(
        program, 0x1000, None, 1 << 10, None, None
    )
    assert ser.serialize(proof) == host_bytes
    assert Verifier(F).verify(proof, program) == "Accept"
