"""Field axiom tests, ported from the reference's colocated tests
(field.zig:248-450, field_presets.zig:114-251)."""

import random

import pytest

from zigz_tpu.core.field import (
    BABYBEAR_P,
    BabyBear,
    F17,
    Field,
    Goldilocks,
    KoalaBear,
    Mersenne31,
    Mersenne61,
    batch_inv,
    field_name,
    has_efficient_reduction,
)


def test_basic_initialization():
    F = Field(17)
    assert F(5).value == 5
    assert F(17).value == 0
    assert F(18).value == 1
    assert F(100).value == 100 % 17


def test_zero_one():
    assert F17.zero().is_zero()
    assert F17.one().is_one()
    assert not F17.zero().is_one()


def test_addition_with_wraparound():
    a = F17(5)
    b = F17(12)
    assert a.add(b).is_zero()  # 17 mod 17 = 0
    assert F17(10).add(F17(10)).value == 3


def test_subtraction_with_borrow():
    assert F17(5).sub(F17(12)).value == 10  # 5 - 12 = -7 = 10 mod 17
    assert F17(12).sub(F17(5)).value == 7


def test_negation():
    assert F17(5).neg().value == 12
    assert F17.zero().neg().is_zero()
    a = F17(7)
    assert a.add(a.neg()).is_zero()


def test_multiplication():
    assert F17(5).mul(F17(3)).value == 15
    assert F17(5).mul(F17(7)).value == 35 % 17
    assert F17(5).mul(F17.one()).value == 5
    assert F17(5).mul(F17.zero()).is_zero()


def test_inverse_fermat():
    # a * a^-1 == 1 for all nonzero a (field.zig Fermat test)
    for v in range(1, 17):
        a = F17(v)
        assert a.mul(a.inv()).is_one()
    with pytest.raises(ZeroDivisionError):
        F17.zero().inv()


def test_division():
    assert F17(15).div(F17(3)).value == 5
    with pytest.raises(ZeroDivisionError):
        F17(5).div(F17.zero())


def test_pow():
    assert F17(2).pow(0).is_one()
    assert F17(2).pow(1).value == 2
    assert F17(2).pow(4).value == 16
    # Fermat's little theorem: a^(p-1) = 1
    for v in (1, 2, 5, 16):
        assert F17(v).pow(16).is_one()


def test_commutativity_associativity_distributivity():
    rng = random.Random(42)
    for _ in range(50):
        a = BabyBear(rng.getrandbits(64))
        b = BabyBear(rng.getrandbits(64))
        c = BabyBear(rng.getrandbits(64))
        assert a.add(b).eql(b.add(a))
        assert a.mul(b).eql(b.mul(a))
        assert a.add(b).add(c).eql(a.add(b.add(c)))
        assert a.mul(b).mul(c).eql(a.mul(b.mul(c)))
        assert a.mul(b.add(c)).eql(a.mul(b).add(a.mul(c)))


def test_babybear_properties():
    assert BabyBear.MODULUS == 2013265921
    assert BabyBear.MODULUS == (1 << 31) - (1 << 27) + 1
    assert BabyBear(1000000).add(BabyBear(2000000)).value == 3000000


def test_koalabear_properties():
    assert KoalaBear.MODULUS == 2130706433
    assert KoalaBear.MODULUS == (1 << 31) - (1 << 24) + 1
    x = KoalaBear(12345)
    assert x.mul(x.inv()).is_one()


def test_goldilocks_properties():
    assert Goldilocks.MODULUS == 0xFFFFFFFF00000001
    a = Goldilocks(12345678901234567)
    b = Goldilocks(98765432109876543)
    assert a.add(b).value == (12345678901234567 + 98765432109876543) % Goldilocks.MODULUS
    big = Goldilocks(0xFFFFFFFEFFFFFFFF)
    assert big.mul(big.inv()).is_one()


def test_mersenne31():
    assert Mersenne31.MODULUS == 2147483647
    assert Mersenne31(Mersenne31.MODULUS).add(Mersenne31.one()).value == 1


def test_field_names():
    assert field_name(F17) == "F17 (test field)"
    assert field_name(BabyBear) == "BabyBear"
    assert field_name(Goldilocks) == "Goldilocks"
    assert field_name(Mersenne61) == "Mersenne61"


def test_efficient_reduction():
    assert has_efficient_reduction(Goldilocks)
    assert has_efficient_reduction(Mersenne31)
    assert not has_efficient_reduction(BabyBear)


def test_canonical_bytes():
    # 8-byte LE limbs for all presets (transcript wire format).
    assert BabyBear(1).to_bytes() == b"\x01" + b"\x00" * 7
    assert BabyBear(0x1000).to_bytes() == (0x1000).to_bytes(8, "little")
    assert Goldilocks.NBYTES == 8


def test_batch_inv():
    vals = [BabyBear(v) for v in (1, 2, 3, 12345, BABYBEAR_P - 1)]
    for v, inv in zip(vals, batch_inv(vals)):
        assert v.mul(inv).is_one()
