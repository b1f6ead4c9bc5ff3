"""Register-file offline memory check (constraints/regcheck.py).

The reference's "register_updates" constraint is a metadata TODO
(builder.zig:77-149); these tests gate our real Spice-style argument:
read values must be last-written values, anchored at the public initial
and final register state, with forged reads/writes/timestamps rejected.
"""

import numpy as np
import pytest

from zigz_tpu.core.field import BabyBear as F
from zigz_tpu.core.hash import FiatShamirTranscript
from zigz_tpu.constraints.regcheck import (
    RegAccessColumns,
    extract_access_columns,
    prove_regcheck,
    verify_regcheck,
)

P = F.MODULUS
rng = np.random.default_rng(17)


def _simulate(n, seed=0, init=None):
    """Random but CONSISTENT register history; returns (access, init, final)."""
    r = np.random.default_rng(seed)
    regs = list(init) if init is not None else [0] * 32
    rs1 = r.integers(0, 32, size=n)
    rs2 = r.integers(0, 32, size=n)
    rd = r.integers(0, 32, size=n)
    rv1 = np.zeros(n, dtype=np.uint64)
    rv2 = np.zeros(n, dtype=np.uint64)
    ov = np.zeros(n, dtype=np.uint64)
    wv = np.zeros(n, dtype=np.uint64)
    for i in range(n):
        rv1[i] = regs[rs1[i]]
        rv2[i] = regs[rs2[i]]
        ov[i] = regs[rd[i]]
        new = int(r.integers(0, 1 << 64, dtype=np.uint64))
        if rd[i] == 0:
            new = 0  # x0 hardwired, like the VM's register file
        wv[i] = new
        regs[rd[i]] = new
    access = extract_access_columns(rs1, rs2, rd, rv1, rv2, ov, wv)
    return access, (list(init) if init is not None else [0] * 32), regs


def _vars(n):
    return max(1, (n - 1).bit_length())


def test_honest_roundtrip():
    access, init, final = _simulate(37)
    rc = prove_regcheck(F, FiatShamirTranscript(), access, _vars(37), init, final)
    assert verify_regcheck(F, FiatShamirTranscript(), rc, 37, _vars(37), init, final)


def test_honest_roundtrip_nonzero_init():
    init = [0] + [int(x) for x in rng.integers(0, 1 << 64, size=31, dtype=np.uint64)]
    access, init_, final = _simulate(16, seed=3, init=init)
    rc = prove_regcheck(F, FiatShamirTranscript(), access, 4, init_, final)
    assert verify_regcheck(F, FiatShamirTranscript(), rc, 16, 4, init_, final)


def test_untouched_registers_cancel():
    """Registers never accessed appear only as init==final pairs."""
    n = 8
    rs1 = np.full(n, 1); rs2 = np.full(n, 2); rd = np.full(n, 3)
    regs = [0] * 32
    rv1 = np.zeros(n, dtype=np.uint64); rv2 = np.zeros(n, dtype=np.uint64)
    ov = np.zeros(n, dtype=np.uint64); wv = np.zeros(n, dtype=np.uint64)
    for i in range(n):
        rv1[i] = regs[1]; rv2[i] = regs[2]; ov[i] = regs[3]
        wv[i] = i + 100
        regs[3] = i + 100
    access = extract_access_columns(rs1, rs2, rd, rv1, rv2, ov, wv)
    rc = prove_regcheck(F, FiatShamirTranscript(), access, 3, None, regs)
    assert verify_regcheck(F, FiatShamirTranscript(), rc, n, 3, None, regs)


def test_forged_read_value_rejected():
    """A read that does not return the last-written value: the honest
    prover refuses; bypassing the self-check, the multiset equation (or a
    Ligero sum claim) fails at verification."""
    access, init, final = _simulate(16, seed=7)

    def forge(cols):
        cols["rv1_0"] = cols["rv1_0"].copy()
        cols["rv1_0"][5] = (cols["rv1_0"][5] + 1) % (1 << 16)

    with pytest.raises(AssertionError, match="regcheck violated"):
        prove_regcheck(F, FiatShamirTranscript(), access, 4, init, final,
                       _forge_hook=forge)
    rc = prove_regcheck(F, FiatShamirTranscript(), access, 4, init, final,
                        _forge_hook=forge, _unsafe_skip_self_checks=True)
    assert not verify_regcheck(F, FiatShamirTranscript(), rc, 16, 4, init, final)


def test_forged_final_state_rejected():
    access, init, final = _simulate(16, seed=9)
    rc = prove_regcheck(F, FiatShamirTranscript(), access, 4, init, final)
    wrong = list(final)
    wrong[7] = (wrong[7] + 1) % (1 << 64)
    assert not verify_regcheck(F, FiatShamirTranscript(), rc, 16, 4, init, wrong)


def test_forged_write_value_rejected():
    """Claiming a different written value than later reads observe."""
    access, init, final = _simulate(16, seed=11)

    def forge(cols):
        cols["wv_1"] = cols["wv_1"].copy()
        cols["wv_1"][2] = (cols["wv_1"][2] + 1) % (1 << 16)

    rc = prove_regcheck(F, FiatShamirTranscript(), access, 4, init, final,
                        _forge_hook=forge, _unsafe_skip_self_checks=True)
    assert not verify_regcheck(F, FiatShamirTranscript(), rc, 16, 4, init, final)


def test_future_read_timestamp_rejected():
    """rt >= its write ts must break the lag decomposition (the committed
    limbs cannot represent the negative lag)."""
    access, init, final = _simulate(16, seed=13)

    def forge(cols):
        # claim access 1 of row 4 read at its own write timestamp
        cols["rt1"] = cols["rt1"].copy()
        cols["rt1"][4] = 3 * 4 + 1
        cols["tl0_1"] = cols["tl0_1"].copy()
        cols["tl0_1"][4] = 3 * 4 + 1

    rc = prove_regcheck(F, FiatShamirTranscript(), access, 4, init, final,
                        _forge_hook=forge, _unsafe_skip_self_checks=True)
    assert not verify_regcheck(F, FiatShamirTranscript(), rc, 16, 4, init, final)


def test_out_of_range_final_ts_rejected():
    access, init, final = _simulate(8, seed=15)
    rc = prove_regcheck(F, FiatShamirTranscript(), access, 3, init, final)
    rc.final_ts[3] = 3 * 8 + 1
    assert not verify_regcheck(F, FiatShamirTranscript(), rc, 8, 3, init, final)


def test_tampered_roots_and_sums_rejected():
    access, init, final = _simulate(8, seed=19)
    rc = prove_regcheck(F, FiatShamirTranscript(), access, 3, init, final)
    rc.root_cols = bytes(32)
    assert not verify_regcheck(F, FiatShamirTranscript(), rc, 8, 3, init, final)

    rc = prove_regcheck(F, FiatShamirTranscript(), access, 3, init, final)
    rc.g_sums["g_r1"] = (rc.g_sums["g_r1"] + 1) % P
    assert not verify_regcheck(F, FiatShamirTranscript(), rc, 8, 3, init, final)

    rc = prove_regcheck(F, FiatShamirTranscript(), access, 3, init, final)
    rc.zc.column_evals["rv1_0"] = (rc.zc.column_evals["rv1_0"] + 1) % P
    assert not verify_regcheck(F, FiatShamirTranscript(), rc, 8, 3, init, final)


def test_extract_access_columns_timestamps():
    """Hand-checked tiny schedule: same-cell accesses chain their ts."""
    rs1 = np.array([1, 1]); rs2 = np.array([2, 1]); rd = np.array([1, 3])
    # step 0: read r1@1 (rt 0), read r2@2 (rt 0), write r1@3 (rt 1)
    # step 1: read r1@4 (rt 3), read r1@5 (rt 4), write r3@6 (rt 0)
    a = extract_access_columns(rs1, rs2, rd,
                               np.zeros(2, np.uint64), np.zeros(2, np.uint64),
                               np.zeros(2, np.uint64), np.zeros(2, np.uint64))
    assert a.read_ts[:, 0].tolist() == [0, 0, 1]
    assert a.read_ts[:, 1].tolist() == [3, 4, 0]
    assert a.final_ts[1] == 5 and a.final_ts[2] == 2 and a.final_ts[3] == 6
    assert a.final_ts[0] == 0


def test_transient_x0_write_rejected():
    """A trace that transiently writes x0 (restoring 0 before the final
    anchor) is CONSISTENT as a plain memory check — only the z0 write
    gadget catches it.  Without it, later reads would observe x0 != 0."""
    n = 4
    # step 0: write x0 := 5; step 1: read x0 (returns 5), write x1 := 7;
    # step 2: restore x0 := 0; step 3: read x1.  Every read returns the
    # last written value, so the plain memory check is satisfied.
    rs1 = np.array([1, 0, 1, 1])
    rs2 = np.array([1, 0, 0, 1])
    rd = np.array([0, 1, 0, 1])
    rv1 = np.array([0, 5, 7, 7], dtype=np.uint64)
    rv2 = np.array([0, 5, 5, 7], dtype=np.uint64)
    ov = np.array([0, 0, 5, 7], dtype=np.uint64)
    wv = np.array([5, 7, 0, 7], dtype=np.uint64)
    access = extract_access_columns(rs1, rs2, rd, rv1, rv2, ov, wv)
    final = [0] * 32
    final[1] = 7
    rc = prove_regcheck(F, FiatShamirTranscript(), access, 2, None, final,
                        _unsafe_skip_self_checks=True)
    assert not verify_regcheck(F, FiatShamirTranscript(), rc, n, 2, None, final)
