"""The native C++ zerocheck (ops/zerocheck_native.py + runtime/dag.cpp)
must be a bit-exact drop-in for the numpy ZerocheckProver on every
combiner — same round evaluations, challenges, terminal column evals,
and transcript state."""

import os

import numpy as np
import pytest

from zigz_tpu.core.field import BabyBear as F
from zigz_tpu.core.hash import FiatShamirTranscript
from zigz_tpu.ops.zerocheck_native import (
    NativeZerocheckProver,
    native_available,
    schedule_slots,
)
from zigz_tpu.proofs.zerocheck import ZerocheckProver

P = F.MODULUS
rng = np.random.default_rng(17)

pytestmark = pytest.mark.skipif(
    not native_available(), reason="dag.cpp runtime unavailable"
)


def _compare(columns, combiner, degree, num_alphas):
    th = FiatShamirTranscript()
    th.append_bytes(b"zcnative-test")
    tn = FiatShamirTranscript()
    tn.append_bytes(b"zcnative-test")

    ph = ZerocheckProver(F, columns, combiner, degree, num_alphas=num_alphas).prove(th)
    pn = NativeZerocheckProver(
        F, columns, combiner, degree, num_alphas=num_alphas
    ).prove(tn)

    assert ph.round_evals == pn.round_evals
    assert ph.final_point == pn.final_point
    assert ph.column_evals == pn.column_evals
    assert th.challenge_value(P) == tn.challenge_value(P)
    return ph


def test_logup_style_combiner_native_rounds():
    # Structural twin of the (pre-extension) memcheck combiner: logUp
    # inverse terms g*(tau - kappa) - sel, limb decompositions, and
    # range-inverse terms, all base-field.  The production memcheck now
    # draws Ext4 challenges (host ZerocheckExtProver), so this exercises
    # the native backend on the same SHAPE of constraint system instead.
    n = 1 << 10
    names = sorted(
        ["__sel__", "__idx__", "vr", "vw", "rt", "st", "g_r", "g_w",
         "tl0", "tl1", "dl0", "dl1", "bk"]
        + [f"a{k}" for k in range(4)] + [f"ba{k}" for k in range(4)]
        + [f"cb{k}" for k in range(4)]
    )
    cols = {nm: rng.integers(0, P, size=n, dtype=np.uint64) for nm in names}
    tau = int(rng.integers(1, P))
    gamma = int(rng.integers(1, P))

    def comb(c, alphas, p):
        P64 = np.uint64(p)
        kappa_r = (c["a0"] + np.uint64(gamma) * c["vr"] + np.uint64(gamma) ** 2 % P64 * c["rt"]) % P64
        kappa_w = (c["a0"] + np.uint64(gamma) * c["vw"] + np.uint64(gamma) ** 2 % P64 * c["__idx__"]) % P64
        t0 = (c["g_r"] * ((tau + p - kappa_r) % P64) % P64 + P64 - c["__sel__"]) % P64
        t1 = (c["g_w"] * ((tau + p - kappa_w) % P64) % P64 + P64 - c["__sel__"]) % P64
        recon = (c["tl0"] + np.uint64(1 << 16) * c["tl1"]) % P64
        t2 = (c["rt"] + P64 - recon) % P64
        t3 = (c["bk"] * ((1 + p - c["bk"]) % P64)) % P64
        acc = np.uint64(alphas[0]) * t0 % P64
        for a, t in zip(alphas[1:], (t1, t2, t3)):
            acc = (acc + np.uint64(a) * t) % P64
        return acc

    _compare(cols, comb, 3, 4)


def test_table_style_combiner_native_rounds():
    # h*(tau - key) - m over a public key table (the RANGE16 shape).
    n = 256
    tau = int(rng.integers(1, P))
    cols = {
        "m": rng.integers(0, P, size=n, dtype=np.uint64),
        "h": rng.integers(0, P, size=n, dtype=np.uint64),
        "__key__": np.arange(n, dtype=np.uint64),
    }

    def comb(c, alphas, p):
        P64 = np.uint64(p)
        term = (c["h"] * ((tau + p - c["__key__"]) % P64) % P64 + P64 - c["m"]) % P64
        return np.uint64(alphas[0]) * term % P64

    proof = _compare(cols, comb, 3, 1)
    assert set(proof.column_evals) == {"m", "h"}


def test_degree_one_and_tiny_tables():
    def comb(cols, alphas, p):
        return np.uint64(alphas[0]) * cols["x"] % np.uint64(p)

    for n in (2, 4):
        cols = {"x": rng.integers(0, P, size=n, dtype=np.uint64)}
        _compare(cols, comb, 1, 1)


def test_slot_recycling_is_compact():
    # A long add chain must reuse a bounded slot pool, not one per node.
    def comb(cols, alphas, p):
        acc = np.zeros_like(cols["x"])
        for k in range(64):
            acc = (acc + np.uint64(alphas[0] + k) * cols["x"]) % np.uint64(p)
        return acc

    from zigz_tpu.ops.symtrace import trace_combiner

    tr = trace_combiner(comb, ["x"], [3], P)
    slots, num_slots = schedule_slots(tr.signature[0], tr.signature[1])
    assert num_slots <= 8
    cols = {"x": rng.integers(0, P, size=64, dtype=np.uint64)}
    _compare(cols, comb, 2, 1)


def test_full_v2_prove_native_zerochecks_byte_identical():
    from zigz_tpu.prover.prover import Prover
    from zigz_tpu.prover.serialization import BinarySerializer
    from zigz_tpu.verifier.verifier import Verifier

    program = (
        bytes([0x93, 0x00, 0x30, 0x00, 0x13, 0x01, 0x40, 0x00])
        + bytes([0xB3, 0x81, 0x20, 0x00]) * 29
        + bytes([0x73, 0x00, 0x10, 0x00])
    )
    ser = BinarySerializer(F)
    prev = os.environ.get("ZIGZ_TPU_ZEROCHECK")
    try:
        os.environ["ZIGZ_TPU_ZEROCHECK"] = "host"
        host_bytes = ser.serialize(
            Prover(F, seed=0, protocol_version=2).prove(program, 0x1000, None, 1 << 8, None, None)
        )
        os.environ["ZIGZ_TPU_ZEROCHECK"] = "native"
        proof = Prover(F, seed=0, protocol_version=2).prove(program, 0x1000, None, 1 << 8, None, None)
        native_bytes = ser.serialize(proof)
    finally:
        if prev is None:
            os.environ.pop("ZIGZ_TPU_ZEROCHECK", None)
        else:
            os.environ["ZIGZ_TPU_ZEROCHECK"] = prev
    assert native_bytes == host_bytes
    assert Verifier(F).verify(proof, program) == "Accept"


# -- extension (BabyBear^4) native prover ------------------------------------

def test_native_ext_zerocheck_byte_identical():
    """NativeZerocheckExtProver must reproduce the numpy ZerocheckExtProver's
    round evals, challenges, terminal evals, and transcript bytes — on a
    combiner mixing base columns, an Ext4 input column, ext challenges,
    and an ext_from_coords recombine."""
    from zigz_tpu.core.ext4 import Ext4, challenge_ext, ext_from_coords, ext_from_ints
    from zigz_tpu.proofs.zerocheck import ZerocheckExtProver

    rng = np.random.default_rng(7)
    n = 1 << 8
    tau = ext_from_ints([5, 6, 7, 8])
    cols = {
        "a": rng.integers(0, P, n, dtype=np.uint64),
        "b": rng.integers(0, P, n, dtype=np.uint64),
        "g#0": rng.integers(0, P, n, dtype=np.uint64),
        "g#1": rng.integers(0, P, n, dtype=np.uint64),
        "g#2": rng.integers(0, P, n, dtype=np.uint64),
        "g#3": rng.integers(0, P, n, dtype=np.uint64),
        "e": Ext4(rng.integers(0, P, (4, n), dtype=np.uint64)),
    }

    def comb(c, alphas, p):
        g = ext_from_coords([c[f"g#{e}"] for e in range(4)])
        t1 = c["a"] * c["b"] % p
        t2 = g * (tau - c["a"]) - c["e"]
        t3 = c["e"] * c["e"] - c["b"]
        return alphas[0] * t1 + alphas[1] * t2 + alphas[2] * t3

    def run(backend):
        prev = os.environ.get("ZIGZ_TPU_ZEROCHECK")
        os.environ["ZIGZ_TPU_ZEROCHECK"] = backend
        try:
            t = FiatShamirTranscript()
            t.append_bytes(b"ext-native-test")
            proof = ZerocheckExtProver(F, dict(cols), comb, 3, num_alphas=3).prove(t)
            probe = challenge_ext(t)
            return proof, probe
        finally:
            if prev is None:
                os.environ.pop("ZIGZ_TPU_ZEROCHECK", None)
            else:
                os.environ["ZIGZ_TPU_ZEROCHECK"] = prev

    ph, probe_h = run("host")
    pn, probe_n = run("native")
    assert probe_h == probe_n  # transcript bytes identical
    assert ph.final_point == pn.final_point
    for ra, rb in zip(ph.round_evals, pn.round_evals):
        assert all(a == b for a, b in zip(ra, rb))
    assert set(ph.column_evals) == set(pn.column_evals)
    for k in ph.column_evals:
        assert ph.column_evals[k] == pn.column_evals[k]
