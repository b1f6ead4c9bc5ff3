"""Extension-field zerocheck (proofs/zerocheck.py ZerocheckExt*):
honest accept, tamper rejection, ext-column (coordinate-table) handling,
and transcript binding."""

import numpy as np

from zigz_tpu.core.ext4 import P, Ext4, ext_from_coords, ext_zeros
from zigz_tpu.core.field import BabyBear
from zigz_tpu.core.hash import FiatShamirTranscript
from zigz_tpu.proofs.zerocheck import (
    ZerocheckExtProver,
    ZerocheckExtVerifier,
)


def _mul_m(a, b, p):
    return a * b % p


def _sub_m(a, b, p):
    return (a + p - b) % p


def _combiner(cols, alphas, p):
    """c1: b*(1-b) = 0 (booleanity); c2: x - y*z = 0; c3: sel*(w-5) = 0."""
    t1 = _mul_m(cols["b"], _sub_m(1, cols["b"], p), p)
    t2 = _sub_m(cols["x"], _mul_m(cols["y"], cols["z"], p), p)
    t3 = _mul_m(cols["__sel__"], _sub_m(cols["w"], 5, p), p)
    return alphas[0] * t1 + alphas[1] * t2 + alphas[2] * t3


def _columns(n=32, seed=0):
    rng = np.random.default_rng(seed)
    b = rng.integers(0, 2, size=n, dtype=np.uint64)
    y = rng.integers(0, P, size=n, dtype=np.uint64)
    z = rng.integers(0, P, size=n, dtype=np.uint64)
    x = y * z % np.uint64(P)
    w = np.full(n, 5, dtype=np.uint64)
    w[n // 2 :] = rng.integers(0, P, size=n // 2, dtype=np.uint64)  # sel masks
    sel = np.zeros(n, dtype=np.uint64)
    sel[: n // 2] = 1
    return {"b": b, "x": x, "y": y, "z": z, "w": w, "__sel__": sel}


def _public_evals(num_vars):
    from zigz_tpu.poly.public_mles import le_indicator_eval

    def fn(rs):
        return {"__sel__": le_indicator_eval((1 << num_vars) // 2 - 1, num_vars, rs, P)}

    return fn


def test_honest_roundtrip():
    cols = _columns()
    t = FiatShamirTranscript()
    t.append_bytes(b"ZCX")
    proof = ZerocheckExtProver(BabyBear, cols, _combiner, degree=3, num_alphas=3).prove(t)

    tv = FiatShamirTranscript()
    tv.append_bytes(b"ZCX")
    ok = ZerocheckExtVerifier(
        BabyBear, _combiner, 3, 3, public_evals=_public_evals(5)
    ).verify(proof, tv)
    assert ok
    # transcripts agree byte-for-byte after the replay
    assert t.finalize() == tv.finalize()


def test_rejects_violated_constraint():
    cols = _columns()
    cols["x"] = (cols["x"] + 1) % np.uint64(P)  # x != y*z somewhere
    t = FiatShamirTranscript()
    proof = ZerocheckExtProver(BabyBear, cols, _combiner, degree=3, num_alphas=3).prove(t)
    tv = FiatShamirTranscript()
    assert not ZerocheckExtVerifier(
        BabyBear, _combiner, 3, 3, public_evals=_public_evals(5)
    ).verify(proof, tv)


def test_rejects_tampered_round_eval():
    cols = _columns()
    t = FiatShamirTranscript()
    proof = ZerocheckExtProver(BabyBear, cols, _combiner, degree=3, num_alphas=3).prove(t)
    proof.round_evals[1][0] = proof.round_evals[1][0] + 1
    tv = FiatShamirTranscript()
    assert not ZerocheckExtVerifier(
        BabyBear, _combiner, 3, 3, public_evals=_public_evals(5)
    ).verify(proof, tv)


def test_rejects_tampered_column_eval():
    cols = _columns()
    t = FiatShamirTranscript()
    proof = ZerocheckExtProver(BabyBear, cols, _combiner, degree=3, num_alphas=3).prove(t)
    proof.column_evals["x"] = proof.column_evals["x"] + 1
    tv = FiatShamirTranscript()
    assert not ZerocheckExtVerifier(
        BabyBear, _combiner, 3, 3, public_evals=_public_evals(5)
    ).verify(proof, tv)


def test_ext_coordinate_columns():
    """A logUp-style ext inverse column enters as 4 base coordinate tables;
    the combiner recombines via ext_from_coords on BOTH sides (arrays at
    prove time, Ext4 scalars at verify time)."""
    n = 16
    rng = np.random.default_rng(3)
    vals = rng.integers(1, P, size=n, dtype=np.uint64)
    tau = Ext4(rng.integers(0, P, size=4, dtype=np.uint64))
    # g = 1 / (tau - vals) in the extension, stored as coordinate columns.
    den = tau - vals
    g = den.inv()

    def combiner(cols, alphas, p):
        gx = ext_from_coords([cols[f"g#{e}"] for e in range(4)])
        term = _sub_m(_mul_m(gx, _sub_m(tau, cols["v"], p), p), 1, p)
        return alphas[0] * term

    cols = {"v": vals}
    for e in range(4):
        cols[f"g#{e}"] = g.c[e]
    t = FiatShamirTranscript()
    proof = ZerocheckExtProver(BabyBear, cols, combiner, degree=3, num_alphas=1).prove(t)
    tv = FiatShamirTranscript()
    assert ZerocheckExtVerifier(BabyBear, combiner, 1, 3).verify(proof, tv)

    # Tampering one coordinate column's terminal eval must reject.
    proof.column_evals["g#2"] = proof.column_evals["g#2"] + 1
    tv2 = FiatShamirTranscript()
    assert not ZerocheckExtVerifier(BabyBear, combiner, 1, 3).verify(proof, tv2)


def test_zero_claim_shape_guard():
    """Zero-round proofs with empty final points must not pass vacuously."""
    from zigz_tpu.proofs.zerocheck import ZerocheckProof

    proof = ZerocheckProof(num_vars=3, degree=3, round_evals=[], final_point=[],
                           column_evals={})
    tv = FiatShamirTranscript()
    assert not ZerocheckExtVerifier(BabyBear, _combiner, 3, 3).verify(proof, tv)
