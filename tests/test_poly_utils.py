"""Univariate / Lagrange / decomposition tests (ports of the colocated
tests in univariate.zig, lagrange.zig, decomposition.zig)."""

import pytest

from zigz_tpu.core.decomposition import (
    Decompose64to31,
    add_decomposed,
    babybear_decompose,
    babybear_fits_single,
    decompose_i64,
    np_decompose64to31,
    verify_range_constraint,
)
from zigz_tpu.core.field import BabyBear, Field
from zigz_tpu.poly.lagrange import (
    BarycentricForm,
    eval_lagrange_basis,
    interpolate,
    vanishing_polynomial,
)
from zigz_tpu.poly.univariate import Univariate

import numpy as np

F = Field(17)


# -- univariate ------------------------------------------------------------

def test_univariate_horner():
    # p(x) = 3 + 2x + x^2
    p = Univariate(F, [F(3), F(2), F(1)])
    assert p.eval(F(0)).value == 3
    assert p.eval(F(2)).value == (3 + 4 + 4) % 17
    assert p.degree() == 2
    assert not p.is_zero()


def test_univariate_ops():
    a = Univariate(F, [F(1), F(2)])
    b = Univariate(F, [F(3), F(0), F(5)])
    s = a.add(b)
    assert [c.value for c in s.coefficients] == [4, 2, 5]
    d = b.sub(a)
    assert [c.value for c in d.coefficients] == [2, 15, 5]
    m = a.mul(b)  # (1+2x)(3+5x^2) = 3 + 6x + 5x^2 + 10x^3
    assert [c.value for c in m.coefficients] == [3, 6, 5, 10]
    n = a.neg()
    assert a.add(n).is_zero()
    sm = a.scalar_mul(F(3))
    assert [c.value for c in sm.coefficients] == [3, 6]


def test_univariate_compose():
    # p(x) = x^2, q(x) = x + 1 -> p(q(x)) = x^2 + 2x + 1
    p = Univariate(F, [F(0), F(0), F(1)])
    q = Univariate(F, [F(1), F(1)])
    c = p.compose(q)
    assert [x.value for x in c.coefficients][:3] == [1, 2, 1]


# -- lagrange --------------------------------------------------------------

def test_interpolation_through_points():
    xs = [F(0), F(1), F(2), F(5)]
    ys = [F(3), F(7), F(2), F(11)]
    poly = interpolate(F, xs, ys)
    for x, y in zip(xs, ys):
        assert poly.eval(x).eql(y)


def test_interpolation_rejects_duplicates():
    with pytest.raises(ValueError):
        interpolate(F, [F(1), F(1)], [F(2), F(3)])


def test_lagrange_basis_kronecker():
    xs = [F(2), F(5), F(9)]
    for i in range(3):
        for j, xj in enumerate(xs):
            v = eval_lagrange_basis(F, xs, i, xj)
            assert v.value == (1 if i == j else 0)


def test_vanishing_polynomial():
    xs = [F(1), F(4), F(6)]
    z = vanishing_polynomial(F, xs)
    for x in xs:
        assert z.eval(x).is_zero()
    assert not z.eval(F(2)).is_zero()


def test_barycentric_matches_interpolation():
    xs = [F(0), F(3), F(7), F(12)]
    ys = [F(5), F(1), F(9), F(4)]
    poly = interpolate(F, xs, ys)
    bary = BarycentricForm(F, xs, ys)
    for x in (F(2), F(8), F(15), F(3)):  # incl. a node hit
        assert bary.eval(x).eql(poly.eval(x))


# -- decomposition ---------------------------------------------------------

def test_decompose_roundtrip():
    for value in (0, 1, (1 << 31) - 1, 1 << 31, 0xDEADBEEFCAFEBABE, (1 << 64) - 1):
        d = Decompose64to31.from_u64(value)
        assert d.is_valid()
        assert d.to_u64() == value
        assert verify_range_constraint(d, value)
        els = d.to_field_elements(BabyBear)
        back = Decompose64to31.from_field_elements(BabyBear, els)
        # low/middle may exceed BabyBear p (31-bit vs p < 2^31): the field
        # elements reduce, so roundtrip through F holds only below p.
        if d.low < BabyBear.MODULUS and d.middle < BabyBear.MODULUS:
            assert back == d


def test_decompose_signed():
    d = decompose_i64(-1)
    assert d.to_u64() == (1 << 64) - 1


def test_babybear_single_vs_triple():
    kind, _ = babybear_decompose(100)
    assert kind == "single" and babybear_fits_single(100)
    kind, d = babybear_decompose(1 << 40)
    assert kind == "triple" and d.to_u64() == 1 << 40


def test_add_decomposed_overflow():
    a = Decompose64to31.from_u64((1 << 64) - 1)
    b = Decompose64to31.from_u64(1)
    total, overflow = add_decomposed(a, b)
    assert overflow and total.to_u64() == 0


def test_np_decompose():
    vals = np.array([0, (1 << 31) - 1, 0xDEADBEEFCAFEBABE], dtype=np.uint64)
    lo, mid, hi = np_decompose64to31(vals)
    recon = lo | (mid << np.uint64(31)) | (hi << np.uint64(62))
    np.testing.assert_array_equal(recon, vals)
