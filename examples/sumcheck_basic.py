"""Standalone sumcheck demo (examples/sumcheck_basic.zig port): prove and
verify the hypercube sum of a small MLE with Fiat-Shamir challenges."""

import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from zigz_tpu.core.field import BabyBear as F
from zigz_tpu.poly.multilinear import Multilinear
from zigz_tpu.proofs.sumcheck import SumcheckProver, SumcheckVerifier


def main():
    evals = [F(v) for v in (3, 1, 4, 1, 5, 9, 2, 6)]
    poly = Multilinear(F, evals)
    claimed = poly.sum_over_hypercube()
    print(f"polynomial: 3 vars, hypercube sum = {claimed.value}")

    proof = SumcheckProver.prove(poly)
    print(f"proof: {proof.num_vars} rounds, final_eval = {proof.final_eval.value}")

    ok, final_claim = SumcheckVerifier.verify_rounds(F, proof, claimed)
    print(f"round verification: {'ACCEPT' if ok else 'REJECT'} (final claim {final_claim.value})")
    assert ok and final_claim.eql(proof.final_eval)


if __name__ == "__main__":
    main()
