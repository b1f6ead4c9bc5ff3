"""Dishonest-prover demo (examples/sumcheck_dishonest.zig port): the
verifier catches a cheating prover who claims a wrong sum or tampers with a
round polynomial."""

import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from zigz_tpu.core.field import BabyBear as F
from zigz_tpu.poly.multilinear import Multilinear
from zigz_tpu.proofs.sumcheck import SumcheckProver, SumcheckVerifier


def main():
    poly = Multilinear(F, [F(v) for v in (3, 1, 4, 1, 5, 9, 2, 6)])
    honest_sum = poly.sum_over_hypercube()
    proof = SumcheckProver.prove(poly)

    # Cheat 1: claim a different sum.
    cheat_sum = honest_sum.add(F(100))
    ok, _ = SumcheckVerifier.verify_rounds(F, proof, cheat_sum)
    print(f"wrong claimed sum:       {'REJECTED' if not ok else 'accepted (!!)'}")
    assert not ok

    # Cheat 2: tamper with a round polynomial.
    proof.round_polynomials[1][0] = proof.round_polynomials[1][0].add(F.one())
    ok, _ = SumcheckVerifier.verify_rounds(F, proof, honest_sum)
    print(f"tampered round poly:     {'REJECTED' if not ok else 'accepted (!!)'}")
    assert not ok

    print("dishonest prover detected in both cases")


if __name__ == "__main__":
    main()
