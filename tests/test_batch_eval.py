"""Batch-evaluation reduction (proofs/batch_eval.py) + mixed-length Ligero
commitments (commitments/ligero.py): the round-3 machinery that collapses
every v2 argument's per-point/per-sum claims into ONE opening per
commitment.  Covers completeness, the end-to-end reduction -> mixed
opening path, and soundness (wrong values, tampered rows/columns)."""

import numpy as np
import pytest

from zigz_tpu.commitments.ligero import (
    LigeroMixedClaim,
    choose_split_mixed,
    LigeroParams,
    ligero_commit_mixed,
    ligero_prove_mixed,
    ligero_verify_mixed,
    mixed_layout,
)
from zigz_tpu.core.ext4 import Ext4, challenge_ext, ext_lift
from zigz_tpu.core.field import BabyBear as F
from zigz_tpu.core.hash import FiatShamirTranscript
from zigz_tpu.proofs.batch_eval import (
    BatchClaim,
    claim_weight_at,
    mixed_claim_from_rho,
    prove_batch_eval,
    verify_batch_eval,
)
from zigz_tpu.proofs.zerocheck import _eq_table_ext

P = F.MODULUS
rng = np.random.default_rng(7)


def _rand_col(v):
    return rng.integers(0, P, size=1 << v, dtype=np.uint64)


def _rand_point(t, v):
    return [challenge_ext(t) for _ in range(v)]


def _mle_eval(col, point):
    eq = _eq_table_ext(point, P)
    return (eq * col).sum()


def _ext_sum(col):
    return ext_lift(int(col.sum(dtype=np.uint64) % np.uint64(P)))


def _fresh(tag=b"batch-eval-test"):
    t = FiatShamirTranscript()
    t.append_bytes(tag)
    return t


def _setup_claims():
    """Mixed-size columns in two commitments; eval claims at three
    distinct points + sum claims, including a short (v < cn) column."""
    cols = {
        ("data", "a"): _rand_col(8),
        ("data", "b"): _rand_col(8),
        ("data", "c"): _rand_col(5),
        ("data", "tiny"): _rand_col(2),
        ("adv", "g0"): _rand_col(8),
        ("adv", "g1"): _rand_col(6),
    }
    tp = _fresh(b"points")
    pt8 = _rand_point(tp, 8)
    pt8b = _rand_point(tp, 8)
    pt5 = _rand_point(tp, 5)
    pt6 = _rand_point(tp, 6)
    pt2 = _rand_point(tp, 2)
    claims = [
        BatchClaim("data", "a", 8, pt8, _mle_eval(cols[("data", "a")], pt8)),
        BatchClaim("data", "b", 8, pt8, _mle_eval(cols[("data", "b")], pt8)),
        BatchClaim("data", "a", 8, pt8b, _mle_eval(cols[("data", "a")], pt8b)),
        BatchClaim("data", "c", 5, pt5, _mle_eval(cols[("data", "c")], pt5)),
        BatchClaim("data", "tiny", 2, pt2, _mle_eval(cols[("data", "tiny")], pt2)),
        BatchClaim("adv", "g0", 8, pt8, _mle_eval(cols[("adv", "g0")], pt8)),
        BatchClaim("adv", "g1", 6, pt6, _mle_eval(cols[("adv", "g1")], pt6)),
        BatchClaim("adv", "g0", 8, None, _ext_sum(cols[("adv", "g0")])),
        BatchClaim("adv", "g1", 6, None, _ext_sum(cols[("adv", "g1")])),
    ]
    return cols, claims


def test_batch_eval_roundtrip():
    cols, claims = _setup_claims()
    tp, tv = _fresh(), _fresh()
    proof = prove_batch_eval(claims, cols, tp)
    assert verify_batch_eval(claims, proof, tv)
    # Transcript states agree after the protocol.
    assert tp.challenge_value(P) == tv.challenge_value(P)


def test_batch_eval_rejects_wrong_value():
    cols, claims = _setup_claims()
    proof = prove_batch_eval(claims, cols, _fresh())
    bad = list(claims)
    bad[3] = BatchClaim(bad[3].commitment, bad[3].name, bad[3].num_vars,
                        bad[3].point, bad[3].value + 1)
    assert not verify_batch_eval(bad, proof, _fresh())


def test_batch_eval_rejects_tampered_terminal():
    cols, claims = _setup_claims()
    proof = prove_batch_eval(claims, cols, _fresh())
    key = sorted(proof.column_evals)[0]
    proof.column_evals[key] = proof.column_evals[key] + 1
    assert not verify_batch_eval(claims, proof, _fresh())


def test_batch_eval_rejects_forged_sum():
    """A prover whose column does NOT sum to the claimed value cannot
    produce passing rounds (the honest prover's own rounds fail)."""
    cols, claims = _setup_claims()
    bad_claims = list(claims)
    bad_claims[7] = BatchClaim("adv", "g0", 8, None,
                               claims[7].value + 12345)
    proof = prove_batch_eval(bad_claims, cols, _fresh())
    assert not verify_batch_eval(bad_claims, proof, _fresh())


def test_mixed_commit_and_open():
    cols, claims = _setup_claims()
    data_cols = {k[1]: v for k, v in cols.items() if k[0] == "data"}
    state = ligero_commit_mixed(F, data_cols, "sha3", num_claims_hint=1)
    col_vars = {name: (len(arr).bit_length() - 1) for name, arr in data_cols.items()}
    names, offsets, heights, total_rows = mixed_layout(col_vars, state.cn)
    assert state.matrix.shape == (total_rows, state.n)

    # Reduce, then open once at rho.
    tp, tv = _fresh(), _fresh()
    proof = prove_batch_eval(claims, cols, tp)
    rho = proof.final_point
    evals = {k[1]: v for k, v in proof.column_evals.items() if k[0] == "data"}
    claim = mixed_claim_from_rho(col_vars, state.cn, rho, evals)
    lp = ligero_prove_mixed(state, [claim], tp)

    assert verify_batch_eval(claims, proof, tv)
    vclaim = mixed_claim_from_rho(col_vars, state.cn, rho, evals)
    assert ligero_verify_mixed(F, state.root, col_vars, [vclaim], lp, tv,
                               "sha3", num_claims_hint=1)
    assert tp.challenge_value(P) == tv.challenge_value(P)


def test_mixed_open_rejects_wrong_eval():
    cols, claims = _setup_claims()
    data_cols = {k[1]: v for k, v in cols.items() if k[0] == "data"}
    state = ligero_commit_mixed(F, data_cols, "sha3")
    col_vars = {name: (len(arr).bit_length() - 1) for name, arr in data_cols.items()}
    proof = prove_batch_eval(claims, cols, _fresh())
    rho = proof.final_point
    evals = {k[1]: v for k, v in proof.column_evals.items() if k[0] == "data"}
    claim = mixed_claim_from_rho(col_vars, state.cn, rho, evals)
    tp = _fresh(b"open")
    lp = ligero_prove_mixed(state, [claim], tp)
    bad_evals = dict(evals)
    bad_evals["c"] = bad_evals["c"] + 1
    bad_claim = mixed_claim_from_rho(col_vars, state.cn, rho, bad_evals)
    assert not ligero_verify_mixed(F, state.root, col_vars, [bad_claim], lp,
                                   _fresh(b"open"), "sha3")


def test_mixed_open_rejects_tampered_column():
    cols, claims = _setup_claims()
    data_cols = {k[1]: v for k, v in cols.items() if k[0] == "data"}
    state = ligero_commit_mixed(F, data_cols, "sha3")
    col_vars = {name: (len(arr).bit_length() - 1) for name, arr in data_cols.items()}
    proof = prove_batch_eval(claims, cols, _fresh())
    evals = {k[1]: v for k, v in proof.column_evals.items() if k[0] == "data"}
    claim = mixed_claim_from_rho(col_vars, state.cn, proof.final_point, evals)
    lp = ligero_prove_mixed(state, [claim], _fresh(b"open"))
    lp.columns[3, 0] = (lp.columns[3, 0] + 1) % P
    assert not ligero_verify_mixed(F, state.root, col_vars, [claim], lp,
                                   _fresh(b"open"), "sha3")


def test_mixed_open_rejects_tampered_u_row():
    cols, claims = _setup_claims()
    data_cols = {k[1]: v for k, v in cols.items() if k[0] == "data"}
    state = ligero_commit_mixed(F, data_cols, "sha3")
    col_vars = {name: (len(arr).bit_length() - 1) for name, arr in data_cols.items()}
    proof = prove_batch_eval(claims, cols, _fresh())
    evals = {k[1]: v for k, v in proof.column_evals.items() if k[0] == "data"}
    claim = mixed_claim_from_rho(col_vars, state.cn, proof.final_point, evals)
    lp = ligero_prove_mixed(state, [claim], _fresh(b"open"))
    u = lp.us[0]
    u.c[0, 0] = (int(u.c[0, 0]) + 1) % P
    assert not ligero_verify_mixed(F, state.root, col_vars, [claim], lp,
                                   _fresh(b"open"), "sha3")


def test_choose_split_mixed_balances():
    params = LigeroParams()
    for D in (1 << 10, 1 << 16, 1 << 22, 1 << 26):
        cn = choose_split_mixed(D, 1, params)
        n = 1 << cn
        cols_bytes = params.num_queries * (D // n) * 4
        rows_bytes = (1 + params.num_rho) * 16 * n
        # within 4x of each other (integral log2 rounding)
        assert cols_bytes < 4 * rows_bytes and rows_bytes < 4 * cols_bytes


def test_batch_eval_native_host_byte_identical():
    """The runtime/dag.cpp round path must reproduce the numpy rounds'
    transcript bytes and proof exactly."""
    import os

    columns, claims = _setup_claims()

    def run(backend):
        prev = os.environ.get("ZIGZ_TPU_ZEROCHECK")
        os.environ["ZIGZ_TPU_ZEROCHECK"] = backend
        try:
            t = _fresh()
            proof = prove_batch_eval(claims, columns, t)
            probe = challenge_ext(t)
            return proof, probe
        finally:
            if prev is None:
                os.environ.pop("ZIGZ_TPU_ZEROCHECK", None)
            else:
                os.environ["ZIGZ_TPU_ZEROCHECK"] = prev

    ph, probe_h = run("host")
    pn, probe_n = run("native")
    assert probe_h == probe_n
    assert ph.final_point == pn.final_point
    for ra, rb in zip(ph.round_evals, pn.round_evals):
        assert all(a == b for a, b in zip(ra, rb))
    assert ph.column_evals == pn.column_evals
