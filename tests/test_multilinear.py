"""Multilinear polynomial tests (multilinear.zig:295-566 ports), including
pins of the reference's two index orderings."""

import pytest

from zigz_tpu.core.field import BabyBear, Field, Goldilocks
from zigz_tpu.poly.multilinear import Multilinear

F = Field(17)


def mle(vals, field=F):
    return Multilinear(field, [field(v) for v in vals])


def test_init_validation():
    with pytest.raises(ValueError):
        Multilinear(F, [])
    with pytest.raises(ValueError):
        mle([1, 2, 3])  # not power of two
    p = mle([1, 2, 3, 4])
    assert p.num_vars == 2


def test_eval_on_hypercube_corners():
    # eval at boolean points returns the stored evaluations;
    # point[0] is the LSB of the index (reference ordering).
    p = mle([3, 5, 7, 11])
    zero, one = F.zero(), F.one()
    assert p.eval([zero, zero]).value == 3   # idx 0b00
    assert p.eval([one, zero]).value == 5    # idx 0b01  (bit0 = point[0])
    assert p.eval([zero, one]).value == 7    # idx 0b10
    assert p.eval([one, one]).value == 11    # idx 0b11


def test_eval_interpolation():
    # p on {0,1}: [a, b] -> p(r) = (1-r)a + rb
    p = mle([3, 5])
    r = F(7)
    expected = (F.one().sub(r)).mul(F(3)).add(r.mul(F(5)))
    assert p.eval([r]).eql(expected)


def test_partial_eval_fixes_msb():
    # partial_eval splits at half: new[i] = (1-r)e[i] + r e[i+half]
    p = mle([1, 2, 3, 4])
    r = F(5)
    q = p.partial_eval(r)
    assert q.num_vars == 1
    om = F.one().sub(r)
    assert q.element(0).eql(om.mul(F(1)).add(r.mul(F(3))))
    assert q.element(1).eql(om.mul(F(2)).add(r.mul(F(4))))


def test_sum_over_hypercube():
    p = mle([1, 2, 3, 4])
    assert p.sum_over_hypercube().value == 10


def test_round_polynomial():
    # [g(0), g(1)-g(0)] with half-split sums.
    p = mle([1, 2, 3, 4])
    coeffs = p.round_polynomial()
    assert coeffs[0].value == 3  # 1+2
    assert coeffs[1].value == (7 - 3) % 17


def test_sumcheck_consistency_property():
    # g(0) + g(1) == total sum (multilinear.zig:546-566).
    p = mle([4, 9, 2, 13, 1, 6, 16, 8])
    coeffs = p.round_polynomial()
    g0 = coeffs[0]
    g1 = coeffs[0].add(coeffs[1])
    assert g0.add(g1).eql(p.sum_over_hypercube())


def test_fold_matches_round_poly_eval():
    # After folding with r, the new hypercube sum equals g(r).
    p = mle([4, 9, 2, 13, 1, 6, 16, 8])
    r = F(11)
    coeffs = p.round_polynomial()
    g_r = coeffs[0].add(r.mul(coeffs[1]))
    assert p.partial_eval(r).sum_over_hypercube().eql(g_r)


def test_add_scalar_mul():
    a = mle([1, 2, 3, 4])
    b = mle([5, 6, 7, 8])
    s = a.add(b)
    assert [int(v) for v in s.evals] == [6, 8, 10, 12]
    sm = a.scalar_mul(F(3))
    assert [int(v) for v in sm.evals] == [3, 6, 9, 12]


def test_zero_and_constant():
    z = Multilinear.zero(F, 3)
    assert z.is_zero() and z.num_vars == 3
    c = Multilinear.constant(F, 2, F(7))
    assert c.sum_over_hypercube().value == 28 % 17


def test_goldilocks_bigint_path():
    G = Goldilocks
    big = G.MODULUS - 2
    p = Multilinear(G, [G(big), G(3), G(big), G(7)])
    r = G(123456789)
    q = p.partial_eval(r)
    om = G.one().sub(r)
    assert q.element(0).eql(om.mul(G(big)).add(r.mul(G(big))))
    # eval at corner
    assert p.eval([G.zero(), G.one()]).value == big


def test_babybear_large():
    vals = list(range(1 << 10))
    p = Multilinear(BabyBear, [BabyBear(v) for v in vals])
    assert p.sum_over_hypercube().value == sum(vals) % BabyBear.MODULUS
    # eval at a random point equals the naive chi-product sum
    point = [BabyBear(7 + i) for i in range(10)]
    naive = BabyBear.zero()
    for idx, v in enumerate(vals):
        term = BabyBear(v)
        for j in range(10):
            bit = (idx >> j) & 1
            basis = point[j] if bit else BabyBear.one().sub(point[j])
            term = term.mul(basis)
        naive = naive.add(term)
    assert p.eval(point).eql(naive)
