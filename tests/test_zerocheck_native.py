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


def test_memcheck_combiner_native_rounds():
    from zigz_tpu.constraints import memcheck as mc

    n = 1 << 10
    names = sorted(
        ["__sel__", "__idx__", "vr", "vw", "rt", "st", "g_r", "g_w",
         "tl0", "tl1", "dl0", "dl1", "bk"]
        + [f"a{k}" for k in range(4)] + [f"ba{k}" for k in range(4)]
        + [f"cb{k}" for k in range(4)]
        + [f"gr_{c}" for c, _ in mc._RANGED] + [c for c, _ in mc._RANGED]
    )
    cols = {nm: rng.integers(0, P, size=n, dtype=np.uint64) for nm in names}
    comb = mc._make_combiner(
        int(rng.integers(1, P)), int(rng.integers(1, P)), int(rng.integers(1, P)), P
    )
    _compare(cols, comb, mc.MEMCHECK_DEGREE, 40)


def test_table_combiner_native_rounds():
    from zigz_tpu.constraints import memcheck as mc

    n = 256
    cols = {
        "m": rng.integers(0, P, size=n, dtype=np.uint64),
        "h": rng.integers(0, P, size=n, dtype=np.uint64),
        "__key__": np.arange(n, dtype=np.uint64),
    }
    proof = _compare(cols, mc._make_table_combiner(int(rng.integers(1, P))),
                     mc.MEMCHECK_DEGREE, 1)
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
