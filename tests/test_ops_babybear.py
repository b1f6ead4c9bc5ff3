"""Device-field property tests: the JAX uint32 Montgomery lanes must agree
bit-for-bit with the exact host field (SURVEY.md §7 step 1)."""

import numpy as np
import pytest

from zigz_tpu.core.field import BabyBear
from zigz_tpu.ops import babybear as bb
from zigz_tpu.ops import mle as mle_ops
from zigz_tpu.poly.multilinear import Multilinear

import jax.numpy as jnp

P = bb.P
rng = np.random.default_rng(1234)


def rand_vals(n):
    return rng.integers(0, P, size=n, dtype=np.uint64).astype(np.uint32)


def test_constants():
    assert P == BabyBear.MODULUS
    assert (bb.NPRIME * P) % (1 << 32) == (1 << 32) - 1  # -p^-1 mod 2^32
    assert bb.R_MOD_P == (1 << 32) % P
    assert bb.R2_MOD_P == pow(2, 64, P)


def test_mont_roundtrip():
    x = rand_vals(1024)
    xm = bb.to_mont(jnp.asarray(x))
    back = np.asarray(bb.from_mont(xm))
    np.testing.assert_array_equal(back, x)
    # numpy twins agree with device conversions
    np.testing.assert_array_equal(np.asarray(xm), bb.np_to_mont(x.astype(np.uint64)))


def test_mont_mul_matches_host():
    a = rand_vals(4096)
    b = rand_vals(4096)
    am = bb.to_mont(jnp.asarray(a))
    bm = bb.to_mont(jnp.asarray(b))
    prod = np.asarray(bb.from_mont(bb.mont_mul(am, bm)))
    expected = (a.astype(np.uint64) * b.astype(np.uint64)) % np.uint64(P)
    np.testing.assert_array_equal(prod.astype(np.uint64), expected)


def test_mont_mul_edge_cases():
    edge = np.array([0, 1, 2, P - 1, P - 2, 1 << 30, (1 << 31) - 1 - ((1 << 31) - 1 - (P - 1))], dtype=np.uint32)
    for a in edge:
        for b in edge:
            am = bb.to_mont(jnp.asarray(np.array([a], dtype=np.uint32)))
            bm = bb.to_mont(jnp.asarray(np.array([b], dtype=np.uint32)))
            got = int(np.asarray(bb.from_mont(bb.mont_mul(am, bm)))[0])
            assert got == (int(a) * int(b)) % P


def test_add_sub_neg():
    a = rand_vals(1000)
    b = rand_vals(1000)
    aj, bj = jnp.asarray(a), jnp.asarray(b)
    np.testing.assert_array_equal(
        np.asarray(bb.add_mod(aj, bj)).astype(np.uint64),
        (a.astype(np.uint64) + b.astype(np.uint64)) % np.uint64(P),
    )
    np.testing.assert_array_equal(
        np.asarray(bb.sub_mod(aj, bj)).astype(np.int64),
        (a.astype(np.int64) - b.astype(np.int64)) % np.int64(P),
    )
    np.testing.assert_array_equal(
        np.asarray(bb.neg_mod(aj)).astype(np.int64),
        (-a.astype(np.int64)) % np.int64(P),
    )


def test_mont_pow_and_inv():
    a = rand_vals(64)
    am = bb.to_mont(jnp.asarray(a))
    sq = np.asarray(bb.from_mont(bb.mont_pow(am, 2)))
    np.testing.assert_array_equal(
        sq.astype(np.uint64), (a.astype(np.uint64) ** 2) % np.uint64(P)
    )
    # Fermat: a * a^-1 == 1 (nonzero a)
    inv = bb.mont_inv(am)
    ones = np.asarray(bb.from_mont(bb.mont_mul(am, inv)))
    np.testing.assert_array_equal(ones, np.ones_like(a))


def test_fold_lsb_matches_host_eval():
    v = 8
    vals = rng.integers(0, P, size=1 << v, dtype=np.uint64)
    point = rng.integers(0, P, size=v, dtype=np.uint64)
    host_poly = Multilinear(BabyBear, vals.copy())
    expected = host_poly.eval([BabyBear.from_reduced(int(r)) for r in point]).value

    m = jnp.asarray(bb.np_to_mont(vals))[None, :]
    pts = jnp.asarray(bb.np_to_mont(point))[None, :]
    got = int(np.asarray(bb.from_mont(mle_ops.batch_eval_lsb(m, pts)))[0])
    assert got == expected


def test_fold_msb_matches_host_partial_eval():
    v = 6
    vals = rng.integers(0, P, size=1 << v, dtype=np.uint64)
    r = int(rng.integers(0, P))
    host = Multilinear(BabyBear, vals.copy()).partial_eval(BabyBear.from_reduced(r))

    m = jnp.asarray(bb.np_to_mont(vals))
    rm = jnp.asarray(bb.np_to_mont(np.array([r], dtype=np.uint64)))
    folded = np.asarray(bb.from_mont(mle_ops.fold_msb(m, rm)))
    np.testing.assert_array_equal(folded.astype(np.uint64), host.evals)


def test_sum_mod_exact():
    vals = rng.integers(0, P, size=1000, dtype=np.uint64)  # odd-ish length
    got = int(np.asarray(mle_ops.sum_mod(jnp.asarray(vals.astype(np.uint32)))))
    assert got == int(vals.sum()) % P


def test_round_poly_msb_matches_host():
    v = 7
    vals = rng.integers(0, P, size=1 << v, dtype=np.uint64)
    host = Multilinear(BabyBear, vals.copy()).round_polynomial()
    g0_host = host[0].value
    g1_host = host[0].add(host[1]).value

    m = jnp.asarray(bb.np_to_mont(vals))
    g0m, g1m = mle_ops.round_poly_msb(m)
    assert int(np.asarray(bb.from_mont(g0m[None]))[0]) == g0_host
    assert int(np.asarray(bb.from_mont(g1m[None]))[0]) == g1_host


def test_eval_backend_vs_43_host_evals():
    v = 6
    B = 43
    matrix = rng.integers(0, P, size=(B, 1 << v), dtype=np.uint64)
    points = rng.integers(0, P, size=(B, v), dtype=np.uint64)
    got = mle_ops.eval_backend(matrix, points)
    for i in range(B):
        host = Multilinear(BabyBear, matrix[i].copy()).eval(
            [BabyBear.from_reduced(int(r)) for r in points[i]]
        )
        assert int(got[i]) == host.value
