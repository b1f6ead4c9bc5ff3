"""The generic device zerocheck (ops/zerocheck_gen.py) must be a bit-exact
drop-in for the host ZerocheckProver on EVERY combiner in the protocol —
same round evaluations, challenges, terminal column evals, and transcript
state.  The combiners are never ported: ops/symtrace.py traces the host
numpy definitions onto Montgomery lanes, so equality here proves both the
tracer and the device round schedule."""

import os

import numpy as np
import pytest

from zigz_tpu.core.field import BabyBear as F
from zigz_tpu.core.hash import FiatShamirTranscript
from zigz_tpu.ops.symtrace import TraceError, trace_combiner
from zigz_tpu.ops.zerocheck_gen import GenericDeviceZerocheck
from zigz_tpu.proofs.zerocheck import ZerocheckProver

P = F.MODULUS
rng = np.random.default_rng(7)


def _compare(columns, combiner, degree, num_alphas, host_tail=16):
    """Prove with both backends from identical transcripts; assert equal."""
    th = FiatShamirTranscript()
    th.append_bytes(b"zcgen-test")
    td = FiatShamirTranscript()
    td.append_bytes(b"zcgen-test")

    host = ZerocheckProver(F, columns, combiner, degree, num_alphas=num_alphas)
    ph = host.prove(th)
    dev = GenericDeviceZerocheck(
        F, columns, combiner, degree, num_alphas=num_alphas, host_tail=host_tail
    )
    pd = dev.prove(td)

    assert ph.round_evals == pd.round_evals
    assert ph.final_point == pd.final_point
    assert ph.column_evals == pd.column_evals
    assert th.challenge_value(P) == td.challenge_value(P)
    return ph


def test_regcheck_combiner_device_rounds():
    from zigz_tpu.constraints import regcheck as rc

    n = 256
    names = ["__sel__", "__idx__", "a3", "ia3", "z0"]
    for m in (1, 2, 3):
        names += [f"a{m}", f"rt{m}", f"g_r{m}", f"g_w{m}",
                  f"tl0_{m}", f"tl1_{m}", f"dl0_{m}", f"dl1_{m}"]
    for pre in ("rv1", "rv2", "ov", "wv"):
        names += [f"{pre}_{k}" for k in range(4)]
    names += [f"gr_{c}" for c, _ in rc._RANGED]
    names += [c for c, _ in rc._RANGED]
    names = list(dict.fromkeys(names))
    cols = {nm: rng.integers(0, P, size=n, dtype=np.uint64) for nm in names}
    comb = rc._make_combiner(
        int(rng.integers(1, P)), int(rng.integers(1, P)), int(rng.integers(1, P)), P
    )
    _compare(cols, comb, rc.REGCHECK_DEGREE, rc.NUM_CONSTRAINTS)


def test_table_combiner_device_rounds():
    from zigz_tpu.constraints import memcheck as mc

    n = 512
    cols = {
        "m": rng.integers(0, P, size=n, dtype=np.uint64),
        "h": rng.integers(0, P, size=n, dtype=np.uint64),
        "__key__": np.arange(n, dtype=np.uint64),
    }
    comb = mc._make_table_combiner(int(rng.integers(1, P)))
    proof = _compare(cols, comb, mc.MEMCHECK_DEGREE, 1)
    # Public __key__ column must not be reported.
    assert set(proof.column_evals) == {"m", "h"}


def test_untraceable_combiner_raises():
    def weird(cols, alphas, p):
        return np.sqrt(cols["x"])  # not ring algebra

    with pytest.raises(TraceError):
        trace_combiner(weird, ["x"], [1], P)


def test_trace_structure_stable_under_challenges():
    from zigz_tpu.constraints import memcheck as mc

    names = sorted(
        ["__sel__", "__idx__", "vr", "vw", "rt", "st", "g_r", "g_w",
         "tl0", "tl1", "dl0", "dl1", "bk"]
        + [f"a{k}" for k in range(4)] + [f"ba{k}" for k in range(4)]
        + [f"cb{k}" for k in range(4)]
        + [f"gr_{c}" for c, _ in mc._RANGED] + [c for c, _ in mc._RANGED]
    )
    t1 = trace_combiner(mc._make_combiner(1, 2, 3, P), names, [4] * 40, P)
    t2 = trace_combiner(
        mc._make_combiner(0, 1, P - 1, P), names, [0] * 40, P
    )
    assert t1.signature == t2.signature
    assert t1.consts != t2.consts  # values differ, structure does not


def test_full_v2_prove_device_zerochecks_byte_identical():
    """End-to-end: forcing the generic device path through EVERY zerocheck
    call site (bytecode, regcheck, memcheck, validity, linkage) must leave
    the v2 proof bytes unchanged."""
    from zigz_tpu.prover.prover import Prover
    from zigz_tpu.prover.serialization import BinarySerializer
    from zigz_tpu.verifier.verifier import Verifier

    # ADDI x1,x0,3; ADDI x2,x0,4; 29 x ADD x3,x1,x2; EBREAK.
    program = (
        bytes([0x93, 0x00, 0x30, 0x00, 0x13, 0x01, 0x40, 0x00])
        + bytes([0xB3, 0x81, 0x20, 0x00]) * 29
        + bytes([0x73, 0x00, 0x10, 0x00])
    )
    ser = BinarySerializer(F)

    prev = os.environ.get("ZIGZ_TPU_ZEROCHECK")
    prev_tail = os.environ.get("ZIGZ_TPU_ZEROCHECK_TAIL")
    try:
        os.environ["ZIGZ_TPU_ZEROCHECK"] = "host"
        host_bytes = ser.serialize(
            Prover(F, seed=0, protocol_version=2).prove(program, 0x1000, None, 1 << 8, None, None)
        )
        os.environ["ZIGZ_TPU_ZEROCHECK"] = "device"
        os.environ["ZIGZ_TPU_ZEROCHECK_TAIL"] = "4"  # force device rounds
        proof = Prover(F, seed=0, protocol_version=2).prove(program, 0x1000, None, 1 << 8, None, None)
        dev_bytes = ser.serialize(proof)
    finally:
        if prev is None:
            os.environ.pop("ZIGZ_TPU_ZEROCHECK", None)
        else:
            os.environ["ZIGZ_TPU_ZEROCHECK"] = prev
        if prev_tail is None:
            os.environ.pop("ZIGZ_TPU_ZEROCHECK_TAIL", None)
        else:
            os.environ["ZIGZ_TPU_ZEROCHECK_TAIL"] = prev_tail

    assert dev_bytes == host_bytes
    assert Verifier(F).verify(proof, program) == "Accept"
