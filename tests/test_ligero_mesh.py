"""Mesh-sharded Ligero commits + batch-eval rounds: byte-identity vs host.

SURVEY §2.11 rows 3-4 (round-5): the v2 unified commitment pipeline's
DATA/ADVICE commits and the batch-evaluation reduction run SPMD under a
``jax.sharding.Mesh`` and must produce exactly the proof bytes of the
replicated host path (the multichip dryrun asserts the same property end
to end on a full v2 prove)."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")

from zigz_tpu.commitments.ligero import (  # noqa: E402
    LigeroParams,
    _hash_columns,
    choose_split_mixed,
    ligero_commit_mixed,
    ligero_prove_mixed,
    ligero_verify_mixed,
    ntt_pow2_u32,
)
from zigz_tpu.proofs.batch_eval import mixed_claim_from_rho  # noqa: E402
from zigz_tpu.core.field import BabyBear as F  # noqa: E402
from zigz_tpu.core.hash import FiatShamirTranscript  # noqa: E402
from zigz_tpu.ops.ligero_mesh import (  # noqa: E402
    MeshEncoded,
    commit_columns_mesh,
    mesh_commit_ok,
)
from zigz_tpu.parallel.dist import make_trace_mesh  # noqa: E402

P = 2013265921


@pytest.fixture(scope="module")
def mesh():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    return make_trace_mesh(8)


def test_mesh_digest_blob_byte_identical(mesh):
    rng = np.random.default_rng(0)
    for rows, n in ((37, 128), (344, 64), (8, 512)):
        n_e = 4 * n
        mat = rng.integers(0, P, size=(rows, n), dtype=np.uint64)
        want = _hash_columns(ntt_pow2_u32(mat, n_e), "sha3")
        assert mesh_commit_ok(mesh, n_e, rows)
        got, _mat_dev = commit_columns_mesh(mesh, mat.astype(np.uint32), n_e)
        assert got == want


def test_mesh_gather_matches_host_encode(mesh):
    rng = np.random.default_rng(1)
    rows, n = 53, 128
    n_e = 4 * n
    mat = rng.integers(0, P, size=(rows, n), dtype=np.uint64)
    _blob, mat_dev = commit_columns_mesh(mesh, mat.astype(np.uint32), n_e)
    idx = rng.integers(0, n_e, size=23).tolist()
    cols = MeshEncoded(mesh, mat_dev, n_e, rows).gather(idx)
    want = ntt_pow2_u32(mat, n_e)[:, idx].T.astype(np.uint64)
    assert np.array_equal(cols, want)


def test_mixed_commit_and_open_mesh_byte_identical(mesh):
    """Full commit -> open -> verify cycle through the public mixed API:
    the sharded commit's root, transcript, and opened proof must equal
    the host path's, and the host verifier must accept."""
    rng = np.random.default_rng(2)
    cols = {
        "a": rng.integers(0, P, size=1 << 12, dtype=np.uint64),
        "b": rng.integers(0, P, size=1 << 11, dtype=np.uint64),
        "c": rng.integers(0, P, size=1 << 8, dtype=np.uint64),
    }
    host = ligero_commit_mixed(F, cols, "sha3")
    state = ligero_commit_mixed(F, cols, "sha3", mesh=mesh)
    assert isinstance(state.encoded, MeshEncoded), "mesh path did not engage"
    assert state.root == host.root

    from zigz_tpu.core.ext4 import challenge_ext
    from zigz_tpu.proofs.batch_eval import _mle_eval_tail

    t_point = FiatShamirTranscript()
    rho = [challenge_ext(t_point) for _ in range(12)]
    evals = {
        name: _mle_eval_tail(arr, rho[12 - (len(arr).bit_length() - 1):])
        for name, arr in cols.items()
    }
    cn = choose_split_mixed(sum(len(a) for a in cols.values()), 1,
                            LigeroParams())
    claim = mixed_claim_from_rho(state.col_vars, cn, rho, evals)

    t1 = FiatShamirTranscript()
    want = ligero_prove_mixed(host, [mixed_claim_from_rho(
        host.col_vars, cn, rho, evals)], t1)
    t2 = FiatShamirTranscript()
    got = ligero_prove_mixed(state, [claim], t2)
    assert np.array_equal(got.columns, want.columns)
    assert all(np.array_equal(g.c, w.c) for g, w in zip(got.us, want.us))

    col_vars = dict(state.col_vars)
    tv = FiatShamirTranscript()
    assert ligero_verify_mixed(F, state.root, col_vars, [claim], got, tv)


def test_batch_eval_mesh_rounds_byte_identical(mesh):
    from zigz_tpu.core.ext4 import challenge_ext, ext_lift
    from zigz_tpu.proofs.batch_eval import BatchClaim, prove_batch_eval
    from zigz_tpu.proofs.zerocheck import _eq_table_ext

    rng = np.random.default_rng(3)
    cols = {}
    claims = []
    t0 = FiatShamirTranscript()
    for i, v in enumerate((10, 10, 8, 6)):
        col = rng.integers(0, P, size=1 << v, dtype=np.uint64)
        cols[("data", f"c{i}")] = col
        if i % 2 == 0:
            pt = [challenge_ext(t0) for _ in range(v)]
            claims.append(BatchClaim("data", f"c{i}", v, pt,
                                     (_eq_table_ext(pt, P) * col).sum()))
        else:
            claims.append(BatchClaim("data", f"c{i}", v, None,
                                     ext_lift(int(col.sum() % P))))

    t1 = FiatShamirTranscript()
    p1 = prove_batch_eval(claims, cols, t1)
    t2 = FiatShamirTranscript()
    p2 = prove_batch_eval(claims, cols, t2, mesh=mesh)
    assert p1.round_evals == p2.round_evals
    assert p1.final_point == p2.final_point
    assert p1.column_evals == p2.column_evals
    # Transcript states must agree after the reduction (same absorbs).
    assert t1.challenge(F) == t2.challenge(F)


@pytest.mark.slow
def test_full_v2_prove_mesh_byte_identical(mesh):
    """Sharded-commit v2 prove at 2^10 == host bytes (the dryrun asserts
    the same at 2^14; this is the in-repo regression)."""
    import os

    from zigz_tpu.prover.prover import Prover
    from zigz_tpu.prover.serialization import BinarySerializer
    from zigz_tpu.verifier.verifier import Verifier

    n_steps = 1 << 10
    program = (bytes([0x93, 0x00, 0x30, 0x00, 0x13, 0x01, 0x40, 0x00])
               + bytes([0xB3, 0x81, 0x20, 0x00]) * (n_steps - 3)
               + bytes([0x73, 0x00, 0x10, 0x00]))
    ser = BinarySerializer(F)
    prev = os.environ.get("ZIGZ_TPU_COMMITMENTS")
    os.environ["ZIGZ_TPU_COMMITMENTS"] = "host"
    try:
        host = ser.serialize(
            Prover(F, seed=0, protocol_version=2).prove(
                program, 0x1000, None, n_steps * 2, None, None)
        )
    finally:
        if prev is None:
            del os.environ["ZIGZ_TPU_COMMITMENTS"]
        else:
            os.environ["ZIGZ_TPU_COMMITMENTS"] = prev
    pm = Prover(F, seed=0, protocol_version=2, mesh=mesh)
    proof = pm.prove(program, 0x1000, None, n_steps * 2, None, None)
    assert pm.last_timings.get("data_commit_sharded") is True
    assert pm.last_timings.get("advice_commit_sharded") is True
    assert ser.serialize(proof) == host
    assert Verifier(F).verify(proof, program) == "Accept"
