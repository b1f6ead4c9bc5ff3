"""Sumcheck for constraint verification (examples/sumcheck_constraint.zig
port): prove that four recorded additions were all computed correctly by
sumchecking the squared-error polynomial C^2(step) over the hypercube —
an honest trace sums to zero, a corrupted one is caught.
"""

import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from zigz_tpu.core.field import F17 as F
from zigz_tpu.poly.multilinear import Multilinear
from zigz_tpu.proofs.sumcheck import SumcheckProver, SumcheckVerifier


def constraint_poly(operations):
    """C^2(step) with C(step) = result - (a + b), as a 2-var MLE."""
    evals = []
    for a, b, result in operations:
        c = F(result).sub(F(a).add(F(b)))
        evals.append(c.mul(c))
    return Multilinear(F, evals)


def run(operations, label):
    print(f"\n{label}")
    for i, (a, b, result) in enumerate(operations):
        print(f"  step {i}: {a} + {b} = {result}")
    poly = constraint_poly(operations)
    claimed = poly.sum_over_hypercube()
    print(f"  sum of squared errors: {claimed.value}")

    proof = SumcheckProver.prove(poly)
    ok, final_claim = SumcheckVerifier.verify_rounds(F, proof, claimed)
    honest = ok and claimed.value == 0
    print(f"  sumcheck rounds: {'consistent' if ok else 'INCONSISTENT'}; "
          f"constraints {'HOLD' if honest else 'VIOLATED'}")
    return honest


def main():
    good = [(2, 3, 5), (7, 1, 8), (4, 5, 9), (6, 2, 8)]
    bad = [(2, 3, 5), (7, 1, 9), (4, 5, 9), (6, 2, 8)]  # step 1 forged

    assert run(good, "Honest trace (all additions correct):")
    assert not run(bad, "Corrupted trace (step 1 claims 7 + 1 = 9):")
    print("\nconstraint sumcheck demo complete: honest accepted, forged caught")


if __name__ == "__main__":
    main()
