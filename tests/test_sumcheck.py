"""Sumcheck protocol tests (ports of sumcheck_verifier.zig:220-427 and the
examples' honest/dishonest prover flows)."""

import numpy as np

from zigz_tpu.core.field import BabyBear, Field
from zigz_tpu.poly.multilinear import Multilinear
from zigz_tpu.proofs.sumcheck import (
    SumcheckProver,
    SumcheckVerifier,
    eval_univariate_coeffs,
)

F = Field(17)


def mle(vals, field=F):
    return Multilinear(field, [field(v) for v in vals])


def test_round_polys_satisfy_sum_invariant():
    poly = mle([3, 1, 4, 1, 5, 9, 2, 6])
    proof = SumcheckProver.prove(poly)
    # Round 0: g(0)+g(1) == total sum; each later round vs g_{i-1}(r_{i-1}).
    claim = poly.sum_over_hypercube()
    for coeffs, r in zip(proof.round_polynomials, proof.final_point):
        g0 = eval_univariate_coeffs(F, coeffs, F.zero())
        g1 = eval_univariate_coeffs(F, coeffs, F.one())
        assert g0.add(g1).eql(claim)
        claim = eval_univariate_coeffs(F, coeffs, r)
    assert claim.eql(proof.final_eval)


def test_verify_rounds_honest():
    poly = mle([3, 1, 4, 1, 5, 9, 2, 6])
    proof = SumcheckProver.prove(poly)
    ok, final_claim = SumcheckVerifier.verify_rounds(F, proof, poly.sum_over_hypercube())
    assert ok
    assert final_claim.eql(proof.final_eval)


def test_verify_rounds_rejects_wrong_sum():
    poly = mle([3, 1, 4, 1, 5, 9, 2, 6])
    proof = SumcheckProver.prove(poly)
    wrong = poly.sum_over_hypercube().add(F.one())
    ok, _ = SumcheckVerifier.verify_rounds(F, proof, wrong)
    assert not ok


def test_verify_rounds_rejects_tampered_round_poly():
    poly = mle([3, 1, 4, 1, 5, 9, 2, 6])
    proof = SumcheckProver.prove(poly)
    proof.round_polynomials[1][0] = proof.round_polynomials[1][0].add(F.one())
    ok, _ = SumcheckVerifier.verify_rounds(F, proof, poly.sum_over_hypercube())
    assert not ok


def test_full_verify_with_oracle_symmetric_poly():
    # The reference's final oracle check evaluates with the reversed index
    # ordering relative to the fold (see proofs/sumcheck.py docstring), so it
    # holds for bit-reversal-symmetric polynomials; a constant MLE is the
    # canonical case and is what the reference's own examples exercise.
    poly = Multilinear.constant(F, 3, F(5))
    proof = SumcheckProver.prove(poly)
    result = SumcheckVerifier.verify(
        F, proof, poly.sum_over_hypercube(), lambda pt: poly.eval(pt)
    )
    assert result.is_valid


def test_full_verify_palindromic_poly():
    # Palindromic evaluation vector => invariant under index bit-reversal.
    vals = [1, 2, 2, 1]
    poly = mle(vals)
    proof = SumcheckProver.prove(poly)
    result = SumcheckVerifier.verify(
        F, proof, poly.sum_over_hypercube(), lambda pt: poly.eval(pt)
    )
    assert result.is_valid


def test_dishonest_prover_detected():
    # Cheat: claim a different sum entirely (examples/sumcheck_dishonest.zig).
    poly = mle([3, 1, 4, 1])
    proof = SumcheckProver.prove(poly)
    cheat_sum = poly.sum_over_hypercube().add(F(3))
    result = SumcheckVerifier.verify(F, proof, cheat_sum, lambda pt: poly.eval(pt))
    assert not result.is_valid


def test_interactive_roundtrip():
    poly = mle([7, 2, 9, 4, 0, 3, 8, 1])
    challenges = [F(3), F(11), F(6)]
    proof = SumcheckProver.prove_interactive(poly, challenges)
    # verify_interactive with matching challenges reaches the final fold.
    claim = poly.sum_over_hypercube()
    for coeffs, r in zip(proof.round_polynomials, challenges):
        g0 = eval_univariate_coeffs(F, coeffs, F.zero())
        g1 = eval_univariate_coeffs(F, coeffs, F.one())
        assert g0.add(g1).eql(claim)
        claim = eval_univariate_coeffs(F, coeffs, r)
    assert claim.eql(proof.final_eval)


def test_fiat_shamir_determinism():
    vals = np.arange(16, dtype=np.uint64)
    p1 = SumcheckProver.prove(Multilinear(BabyBear, vals.copy()))
    p2 = SumcheckProver.prove(Multilinear(BabyBear, vals.copy()))
    assert p1.to_bytes() == p2.to_bytes()
    # Different polynomial -> different challenges.
    vals2 = vals.copy()
    vals2[3] += 1
    p3 = SumcheckProver.prove(Multilinear(BabyBear, vals2))
    assert [c.value for c in p3.final_point] != [c.value for c in p1.final_point]


def test_proof_to_bytes_layout():
    poly = mle([1, 2, 3, 4])
    proof = SumcheckProver.prove(poly)
    data = proof.to_bytes()
    # [num_vars u64][2 coeffs/round * v][point v][eval] all 8-byte LE.
    assert len(data) == 8 * (1 + 2 * 2 + 2 + 1)
    assert int.from_bytes(data[:8], "little") == 2
