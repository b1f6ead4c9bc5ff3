"""Device ext zerocheck (ops/zerocheck_dev_ext) == host/native provers.

The device prover must emit byte-identical transcripts, round polynomials,
final points, and terminal column evaluations — same contract the native
C++ twin already satisfies (tests/test_zerocheck_native.py).  Runs on the
CPU backend (conftest pins JAX_PLATFORMS=cpu with a virtual 8-device mesh).
"""

import os

import numpy as np
import pytest

from zigz_tpu.core.ext4 import Ext4, ext_from_ints
from zigz_tpu.core.field import BabyBear
from zigz_tpu.core.hash import FiatShamirTranscript
from zigz_tpu.ops.zerocheck_dev_ext import GenericDeviceZerocheckExt
from zigz_tpu.proofs.zerocheck import ZerocheckExtProver, ZerocheckExtVerifier

P = 2013265921


def _mk_columns(v, seed=0, with_ext=True):
    """Columns satisfying c5: a*b - c == 0 plus a free ext column."""
    rng = np.random.default_rng(seed)
    n = 1 << v
    a = rng.integers(0, P, size=n, dtype=np.uint64)
    b = rng.integers(0, P, size=n, dtype=np.uint64)
    c = a * b % np.uint64(P)
    cols = {"a": a, "b": b, "c": c}
    if with_ext:
        g = Ext4(rng.integers(0, P, size=(4, n), dtype=np.uint64))
        cols["g"] = g
    return cols


def _combiner(cols, alphas, p):
    # alpha0 * (a*b - c)  [vanishes]  + alpha1 * (g - g)  [vanishes]
    t0 = (cols["a"] * cols["b"] % p + p - cols["c"]) % p
    z = (cols["g"] + p - cols["g"]) % p if "g" in cols else 0
    return (alphas[0] * t0 + alphas[1] * z) % p


def _prove_with(backend, columns, degree=3, host_tail=None):
    t = FiatShamirTranscript()
    t.append_bytes(b"ZC_DEV_TEST")
    old = os.environ.get("ZIGZ_TPU_ZEROCHECK")
    try:
        if backend == "device":
            prover = GenericDeviceZerocheckExt(
                BabyBear, columns, _combiner, degree, num_alphas=2,
                host_tail=host_tail,
            )
            proof = prover.prove(t)
        else:
            os.environ["ZIGZ_TPU_ZEROCHECK"] = backend
            proof = ZerocheckExtProver(
                BabyBear, columns, _combiner, degree, num_alphas=2
            ).prove(t)
    finally:
        if old is None:
            os.environ.pop("ZIGZ_TPU_ZEROCHECK", None)
        else:
            os.environ["ZIGZ_TPU_ZEROCHECK"] = old
    return proof, t.finalize()


def _assert_equal(pa, da, pb, db):
    assert da == db, "transcript digests differ"
    assert pa.num_vars == pb.num_vars and pa.degree == pb.degree
    assert pa.final_point == pb.final_point
    assert [[g for g in r] for r in pa.round_evals] \
        == [[g for g in r] for r in pb.round_evals]
    assert sorted(pa.column_evals) == sorted(pb.column_evals)
    for k in pa.column_evals:
        assert pa.column_evals[k] == pb.column_evals[k], k


@pytest.mark.parametrize("v", [4, 7, 10])
def test_device_matches_host_numpy(v):
    cols = _mk_columns(v)
    ph, dh = _prove_with("host", cols)
    pd, dd = _prove_with("device", cols, host_tail=1 << 3)
    _assert_equal(ph, dh, pd, dd)


def test_device_matches_native():
    cols = _mk_columns(9, seed=3)
    pn, dn = _prove_with("native", cols)
    pd, dd = _prove_with("device", cols, host_tail=1 << 4)
    _assert_equal(pn, dn, pd, dd)


def test_device_tail_boundaries():
    """Tail thresholds: all-device, mixed, and effectively-all-host must all
    agree with the pure host prover."""
    cols = _mk_columns(6, seed=7)
    ph, dh = _prove_with("host", cols)
    for tail in (2, 8, 32, 64):
        pd, dd = _prove_with("device", cols, host_tail=tail)
        _assert_equal(ph, dh, pd, dd)


def test_device_base_only_columns():
    cols = _mk_columns(8, seed=11, with_ext=False)

    def comb(cols, alphas, p):
        return alphas[0] * ((cols["a"] * cols["b"] % p + p - cols["c"]) % p) % p

    t1 = FiatShamirTranscript()
    p1 = ZerocheckExtProver(BabyBear, cols, comb, 3, num_alphas=1)
    os.environ["ZIGZ_TPU_ZEROCHECK"] = "host"
    try:
        proof1 = p1.prove(t1)
    finally:
        os.environ.pop("ZIGZ_TPU_ZEROCHECK", None)
    t2 = FiatShamirTranscript()
    proof2 = GenericDeviceZerocheckExt(
        BabyBear, cols, comb, 3, num_alphas=1, host_tail=4
    ).prove(t2)
    _assert_equal(proof1, t1.finalize(), proof2, t2.finalize())


def test_device_dev_columns_resident():
    """Columns pre-uploaded as canonical u32 device arrays give identical
    results (the no-upload path used by the unified pipeline)."""
    import jax.numpy as jnp

    cols = _mk_columns(8, seed=13)
    dev_cols = {
        name: jnp.asarray(arr.astype(np.uint32))
        for name, arr in cols.items() if not isinstance(arr, Ext4)
    }
    ph, dh = _prove_with("host", cols)
    t = FiatShamirTranscript()
    t.append_bytes(b"ZC_DEV_TEST")
    pd = GenericDeviceZerocheckExt(
        BabyBear, cols, _combiner, 3, num_alphas=2,
        dev_columns=dev_cols, host_tail=8,
    ).prove(t)
    _assert_equal(ph, dh, pd, t.finalize())


def test_device_proof_verifies():
    cols = _mk_columns(8, seed=17)
    t = FiatShamirTranscript()
    t.append_bytes(b"ZC_DEV_TEST")
    proof = GenericDeviceZerocheckExt(
        BabyBear, cols, _combiner, 3, num_alphas=2, host_tail=8
    ).prove(t)
    tv = FiatShamirTranscript()
    tv.append_bytes(b"ZC_DEV_TEST")
    assert ZerocheckExtVerifier(BabyBear, _combiner, 2, 3).verify(proof, tv)
    assert tv.finalize() == t.finalize()


def test_real_v2_combiner_matches():
    """The actual core-argument combiner (make_v2_combiner) through the
    device prover matches the host prover byte-for-byte."""
    from zigz_tpu.constraints.v2 import NUM_V2_ALPHAS, V2_DEGREE, make_v2_combiner

    rng = np.random.default_rng(23)
    tau = ext_from_ints([int(x) for x in rng.integers(0, P, size=4)])
    beta = ext_from_ints([int(x) for x in rng.integers(0, P, size=4)])
    comb = make_v2_combiner(tau, beta)

    # Structural columns only — values need not satisfy the constraints
    # (both provers run the same sumcheck on the same data either way).
    from zigz_tpu.constraints.core_arg import CORE_COLUMNS, V2_G_COLUMNS
    from zigz_tpu.constraints.v2 import logup_public_tables

    v = 6
    n = 1 << v
    cols = {}
    for name in CORE_COLUMNS:
        cols[name] = rng.integers(0, P, size=n, dtype=np.uint64)
    for name in V2_G_COLUMNS:
        cols[name] = rng.integers(0, P, size=n, dtype=np.uint64)
    cols.update(logup_public_tables(n, v, P))

    def prove(backend):
        t = FiatShamirTranscript()
        if backend == "device":
            proof = GenericDeviceZerocheckExt(
                BabyBear, cols, comb, V2_DEGREE, num_alphas=NUM_V2_ALPHAS,
                host_tail=8,
            ).prove(t)
        else:
            os.environ["ZIGZ_TPU_ZEROCHECK"] = "host"
            try:
                proof = ZerocheckExtProver(
                    BabyBear, cols, comb, V2_DEGREE, num_alphas=NUM_V2_ALPHAS
                ).prove(t)
            finally:
                os.environ.pop("ZIGZ_TPU_ZEROCHECK", None)
        return proof, t.finalize()

    ph, dh = prove("host")
    pd, dd = prove("device")
    _assert_equal(ph, dh, pd, dd)
