"""Ligero PCS: NTT correctness, honest accept, and — the round-2 soundness
gate — tampered claimed evals AND tampered committed column data must be
rejected (VERDICT.md next-round item 2)."""

import numpy as np
import pytest

from zigz_tpu.core.field import BabyBear as F
from zigz_tpu.core.hash import FiatShamirTranscript
from zigz_tpu.commitments.ligero import (
    LigeroParams,
    ligero_commit,
    ligero_prove_eval,
    ligero_verify_eval,
    ntt_pow2,
)
from zigz_tpu.poly.multilinear import Multilinear

rng = np.random.default_rng(57)
P = F.MODULUS


def test_ntt_matches_naive_eval():
    n = 16
    coeffs = rng.integers(0, P, size=n, dtype=np.uint64)
    out = ntt_pow2(coeffs, 64)
    from zigz_tpu.commitments.ligero import _root_of_unity

    w = _root_of_unity(64)
    for j in [0, 1, 7, 63]:
        x = pow(w, j, P)
        expect = 0
        for c in reversed(coeffs.tolist()):
            expect = (expect * x + int(c)) % P
        assert int(out[j]) == expect


def test_ntt_batch_rows():
    rows = rng.integers(0, P, size=(5, 8), dtype=np.uint64)
    batch = ntt_pow2(rows, 32)
    for i in range(5):
        np.testing.assert_array_equal(batch[i], ntt_pow2(rows[i], 32))


def _mle_eval_msb(evals, rs):
    """Reference evaluation with the MSB-first fold ordering (r_1 = MSB)."""
    cur = np.asarray(evals, dtype=np.uint64)
    for r in rs:
        half = len(cur) // 2
        om = (1 - r) % P
        cur = (np.uint64(om) * cur[:half] + np.uint64(r) * cur[half:]) % np.uint64(P)
    return int(cur[0])


PARAMS = LigeroParams(num_queries=32)  # smaller t for test speed


def _setup(v=8, hash_mode="sha3"):
    cols = {
        "a": rng.integers(0, P, size=1 << v, dtype=np.uint64),
        "b": rng.integers(0, P, size=1 << v, dtype=np.uint64),
        "c": rng.integers(0, P, size=1 << v, dtype=np.uint64),
    }
    state = ligero_commit(F, cols, hash_mode, PARAMS)
    rs = [int(x) for x in rng.integers(0, P, size=v)]
    evals = {name: _mle_eval_msb(cols[name], rs) for name in cols}
    proof = ligero_prove_eval(state, rs, FiatShamirTranscript(), PARAMS)
    return state, rs, evals, proof


def _verify(state, rs, evals, proof, hash_mode="sha3"):
    return ligero_verify_eval(
        F, state.root, state.num_vars, state.names, evals, rs, proof,
        FiatShamirTranscript(), hash_mode, PARAMS
    )


def test_honest_accept():
    state, rs, evals, proof = _setup()
    assert _verify(state, rs, evals, proof)


def test_honest_accept_poseidon2():
    state, rs, evals, proof = _setup(hash_mode="poseidon2")
    assert _verify(state, rs, evals, proof, hash_mode="poseidon2")


def test_tampered_claimed_eval_rejected():
    state, rs, evals, proof = _setup()
    evals["b"] = (evals["b"] + 1) % P
    assert not _verify(state, rs, evals, proof)


def test_tampered_u_row_rejected():
    state, rs, evals, proof = _setup()
    proof.u.c[0][3] = (proof.u.c[0][3] + 1) % np.uint64(P)  # u rows are Ext4 now
    assert not _verify(state, rs, evals, proof)


def test_tampered_column_rejected():
    state, rs, evals, proof = _setup()
    proof.columns[5][2] = (proof.columns[5][2] + 1) % P
    assert not _verify(state, rs, evals, proof)


def test_tampered_commitment_data_rejected():
    # Corrupt the committed polynomial AFTER deriving honest claims: the
    # prover commits to garbage but claims the honest evals — the column
    # checks or the <u,b> binding must catch it.
    v = 8
    cols = {"a": rng.integers(0, P, size=1 << v, dtype=np.uint64)}
    honest_state = ligero_commit(F, cols, "sha3", PARAMS)
    rs = [int(x) for x in rng.integers(0, P, size=v)]
    evals = {"a": _mle_eval_msb(cols["a"], rs)}

    forged = dict(cols)
    forged["a"] = cols["a"].copy()
    forged["a"][17] = (forged["a"][17] + 123) % P
    forged_state = ligero_commit(F, forged, "sha3", PARAMS)
    proof = ligero_prove_eval(forged_state, rs, FiatShamirTranscript(), PARAMS)
    # Verify against the FORGED root but the honest evals: must fail.
    assert not ligero_verify_eval(
        F, forged_state.root, v, ["a"], evals, rs, proof,
        FiatShamirTranscript(), "sha3", PARAMS
    )


def test_wrong_root_rejected():
    state, rs, evals, proof = _setup()
    assert not ligero_verify_eval(
        F, bytes(32), state.num_vars, state.names, evals, rs, proof,
        FiatShamirTranscript(), "sha3", PARAMS
    )


def test_ext_point_claims():
    """Evaluation claims at a BabyBear^4 point: honest accept, tampered
    ext eval rejected — the shape every v2+ zerocheck binding now uses."""
    from zigz_tpu.core.ext4 import Ext4, ext_lift

    v = 6
    cols = {
        "a": rng.integers(0, P, size=1 << v, dtype=np.uint64),
        "b": rng.integers(0, P, size=1 << v, dtype=np.uint64),
    }
    state = ligero_commit(F, cols, "sha3", PARAMS)
    rs = [Ext4(rng.integers(0, P, size=4, dtype=np.uint64)) for _ in range(v)]

    def mle_ext(col):
        cur = ext_lift(col)
        for r in rs:
            half = len(cur) // 2
            cur = (1 - r) * cur[..., :half] + r * cur[..., half:]
        return Ext4(cur.c[:, 0])

    evals = {name: mle_ext(cols[name]) for name in cols}
    proof = ligero_prove_eval(state, rs, FiatShamirTranscript(), PARAMS)
    assert ligero_verify_eval(
        F, state.root, v, state.names, evals, rs, proof,
        FiatShamirTranscript(), "sha3", PARAMS
    )
    evals["a"] = evals["a"] + 1
    assert not ligero_verify_eval(
        F, state.root, v, state.names, evals, rs, proof,
        FiatShamirTranscript(), "sha3", PARAMS
    )


def test_ext_point_with_sum_claim():
    """Mixed claim list: an ext eval claim plus a base all-ones hypercube
    sum claim on the same commitment (the logUp g-column shape)."""
    from zigz_tpu.commitments.ligero import (
        LigeroClaim,
        _row_col_weights,
        ligero_prove_claims,
        ligero_verify_claims,
    )
    from zigz_tpu.core.ext4 import Ext4, ext_lift

    v = 6
    col = rng.integers(0, P, size=1 << v, dtype=np.uint64)
    state = ligero_commit(F, {"g": col}, "sha3", PARAMS)
    rs = [Ext4(rng.integers(0, P, size=4, dtype=np.uint64)) for _ in range(v)]
    a, b = _row_col_weights(rs, state.cn)
    claims = [
        LigeroClaim(a=a, b=b, values={}),
        LigeroClaim(a=np.ones(state.m, dtype=np.uint64),
                    b=np.ones(state.n, dtype=np.uint64), values={}),
    ]
    proof = ligero_prove_claims(state, claims, FiatShamirTranscript(), PARAMS)

    cur = ext_lift(col)
    for r in rs:
        half = len(cur) // 2
        cur = (1 - r) * cur[..., :half] + r * cur[..., half:]
    ev = Ext4(cur.c[:, 0])
    s = int(col.sum(dtype=np.uint64) % np.uint64(P))
    vclaims = [
        LigeroClaim(a=a, b=b, values={"g": ev}),
        LigeroClaim(a=np.ones(state.m, dtype=np.uint64),
                    b=np.ones(state.n, dtype=np.uint64), values={"g": s}),
    ]
    assert ligero_verify_claims(
        F, state.root, v, ["g"], vclaims, proof,
        FiatShamirTranscript(), "sha3", PARAMS
    )
    vclaims[1] = LigeroClaim(a=vclaims[1].a, b=vclaims[1].b,
                             values={"g": (s + 1) % P})
    assert not ligero_verify_claims(
        F, state.root, v, ["g"], vclaims, proof,
        FiatShamirTranscript(), "sha3", PARAMS
    )


def test_tiny_num_vars():
    for v in (1, 2):
        cols = {"a": rng.integers(0, P, size=1 << v, dtype=np.uint64)}
        state = ligero_commit(F, cols, "sha3", PARAMS)
        rs = [int(x) for x in rng.integers(0, P, size=v)]
        evals = {"a": _mle_eval_msb(cols["a"], rs)}
        proof = ligero_prove_eval(state, rs, FiatShamirTranscript(), PARAMS)
        assert ligero_verify_eval(
            F, state.root, v, ["a"], evals, rs, proof,
            FiatShamirTranscript(), "sha3", PARAMS
        )
