"""BabyBear^4 extension field (core/ext4.py): axioms, Frobenius inverse,
operator-overload genericity with base numpy operands, and the helpers the
v2+ protocol layers rely on."""

import numpy as np
import pytest

from zigz_tpu.core.ext4 import (
    P,
    SIGMA,
    W,
    Ext4,
    challenge_ext,
    ext_from_coords,
    ext_from_ints,
    ext_lift,
    ext_pow_range,
    ext_stack,
    ext_zeros,
)


def _rand(rng, shape=()):
    return Ext4(rng.integers(0, P, size=(4,) + shape, dtype=np.uint64))


def _ref_mul(a, b):
    """Polynomial multiplication mod (X^4 - W) on int tuples."""
    prod = [0] * 7
    for i in range(4):
        for j in range(4):
            prod[i + j] += a[i] * b[j]
    out = [0] * 4
    for k in range(7):
        if k < 4:
            out[k] += prod[k]
        else:
            out[k - 4] += W * prod[k]
    return tuple(v % P for v in out)


def test_modulus_is_irreducible():
    assert P % 4 == 1
    assert pow(W, (P - 1) // 2, P) == P - 1  # W is a non-QR
    assert pow(SIGMA, 2, P) == P - 1  # sigma is a primitive 4th root of unity


def test_mul_matches_reference_poly_mul():
    rng = np.random.default_rng(0)
    for _ in range(50):
        a, b = _rand(rng), _rand(rng)
        assert (a * b).to_ints() == _ref_mul(a.to_ints(), b.to_ints())


def test_ring_axioms_vectorized():
    rng = np.random.default_rng(1)
    a, b, c = (_rand(rng, (64,)) for _ in range(3))
    assert a + b == b + a
    assert (a + b) + c == a + (b + c)
    assert a * b == b * a
    assert (a * b) * c == a * (b * c)
    assert a * (b + c) == a * b + a * c
    assert a - a == ext_zeros((64,))
    assert a + (-a) == ext_zeros((64,))


def test_frobenius_is_pth_power():
    rng = np.random.default_rng(2)
    a = _rand(rng)
    assert a.frobenius(1) == a ** P
    assert a.frobenius(2) == a.frobenius(1).frobenius(1)


def test_inverse():
    rng = np.random.default_rng(3)
    a = _rand(rng, (128,))
    one = ext_lift(np.ones(128, dtype=np.uint64))
    assert a * a.inv() == one
    # scalar path + zero maps to zero
    s = _rand(rng)
    assert (s * s.inv()).to_ints() == (1, 0, 0, 0)
    z = ext_zeros()
    assert z.inv().to_ints() == (0, 0, 0, 0)


def test_multiplicative_order_sanity():
    # |F_{p^4}^*| = p^4 - 1; a^(p^4-1) == 1 for random nonzero a.
    rng = np.random.default_rng(4)
    a = _rand(rng)
    assert (a ** (P**4 - 1)).to_ints() == (1, 0, 0, 0)


def test_mixed_operand_genericity():
    """The combiner idioms `(a + p - b) % p` and `a * b % p` must work for
    every base/ext operand mix — this is what lets the protocol combiners
    stay type-generic."""
    rng = np.random.default_rng(5)
    e = _rand(rng, (32,))
    base = rng.integers(0, P, size=32, dtype=np.uint64)
    k = 12345

    def sub_m(a, b, p):
        return (a + p - b) % p

    def mul_m(a, b, p):
        return a * b % p

    lifted = ext_lift(base)
    assert sub_m(e, base, P) == e - lifted
    assert sub_m(base, e, P) == lifted - e
    assert mul_m(e, base, P) == e * lifted
    assert mul_m(base, e, P) == e * lifted
    assert sub_m(e, k, P) == e - ext_lift(k)
    assert sub_m(k, e, P) == ext_lift(k) - e
    assert mul_m(k, e, P) == e * ext_lift(k)
    # sum() builtin starts from int 0
    assert sum([e, e]) == e + e
    # unreduced base operands (< 2^33, e.g. 3*idx + m) coerce correctly
    big = base.astype(np.uint64) * np.uint64(3) + np.uint64(7)
    assert e + big == e + ext_lift(big % np.uint64(P))


def test_public_mle_evals_accept_ext_points():
    """idx/le/eq closed-form MLEs evaluate at extension points through the
    same generic code paths (poly/public_mles.py)."""
    from zigz_tpu.poly.public_mles import (
        eq_zero_eval,
        idx_eval,
        idx_table,
        le_indicator_eval,
        le_table,
    )

    rng = np.random.default_rng(6)
    v = 4
    rs = [_rand(rng) for _ in range(v)]

    # Fold the dense tables at the same ext point and compare.
    def fold(table):
        cur = ext_lift(np.asarray(table, dtype=np.uint64) % np.uint64(P))
        for r in rs:
            half = len(cur) // 2
            cur = (1 - r) * cur[:half] + r * cur[half:]
        return Ext4(cur.c[:, 0])

    assert idx_eval(v, rs, P) == fold(idx_table(v, P))
    c = 9
    assert le_indicator_eval(c, v, rs, P) == fold(le_table(c, v))
    eq0 = np.zeros(1 << v, dtype=np.uint64)
    eq0[0] = 1
    assert eq_zero_eval(rs, P) == fold(eq0)


def test_ext_from_coords_consistency():
    rng = np.random.default_rng(7)
    cols = [rng.integers(0, P, size=16, dtype=np.uint64) for _ in range(4)]
    stacked = ext_from_coords(cols)
    # Recombining from lifted (Ext4) coordinates must agree.
    recomb = ext_from_coords([ext_lift(c) for c in cols])
    assert stacked == recomb
    # And a random MLE-style fold of both representations agrees.
    r = _rand(rng)
    f1 = (1 - r) * stacked[: 8] + r * stacked[8:]
    f2 = ext_from_coords([(1 - r) * ext_lift(c[:8]) + r * ext_lift(c[8:]) for c in cols])
    assert f1 == f2


def test_pow_range_and_stack():
    rng = np.random.default_rng(8)
    g = _rand(rng)
    pr = ext_pow_range(g, 9)
    acc = g
    for k in range(9):
        assert Ext4(pr.c[:, k]) == acc
        acc = acc * g
    st = ext_stack([g, g * g])
    assert Ext4(st.c[:, 1]) == g * g


def test_challenge_ext_deterministic():
    from zigz_tpu.core.hash import FiatShamirTranscript

    t1, t2 = FiatShamirTranscript(), FiatShamirTranscript()
    t1.append_bytes(b"seed")
    t2.append_bytes(b"seed")
    c1, c2 = challenge_ext(t1), challenge_ext(t2)
    assert c1 == c2
    assert challenge_ext(t1) != c1  # digest re-absorb advances the state


def test_where_and_masked_select():
    from zigz_tpu.core.ext4 import ext_where

    rng = np.random.default_rng(9)
    a, b = _rand(rng, (8,)), _rand(rng, (8,))
    mask = np.array([1, 0, 1, 0, 1, 1, 0, 0], dtype=bool)
    w = ext_where(mask, a, b)
    assert Ext4(w.c[:, 0]) == Ext4(a.c[:, 0])
    assert Ext4(w.c[:, 1]) == Ext4(b.c[:, 1])


def test_native_kernels_match_numpy():
    """runtime/ext4.cpp twins must produce the numpy path's exact
    canonical residues (mul / scale / mul-base / inv, incl. inv(0)=0 and
    non-canonical base inputs)."""
    import zigz_tpu.core.ext4 as E

    if E._native() is None:
        import pytest

        pytest.skip("native ext4 kernels unavailable")
    rng = np.random.default_rng(11)
    n = 1 << 13  # above _NATIVE_MIN so the native path engages
    a = Ext4(rng.integers(0, P, (4, n), dtype=np.uint64))
    b = Ext4(rng.integers(0, P, (4, n), dtype=np.uint64))
    s = ext_from_ints([123, 456, 789, 101112])
    base = rng.integers(0, 1 << 63, n, dtype=np.uint64)  # non-canonical

    def run_numpy(fn):
        saved = dict(E._NATIVE_STATE)
        E._NATIVE_STATE["checked"] = True
        E._NATIVE_STATE["fn"] = None
        try:
            return fn()
        finally:
            E._NATIVE_STATE.update(saved)

    for fn in (lambda: a * b, lambda: a * s, lambda: s * a,
               lambda: a * base, lambda: s * base, lambda: a.inv()):
        assert fn() == run_numpy(fn)
    z = Ext4(np.zeros((4, n), dtype=np.uint64))
    assert z.inv() == z
