"""Lookup validity argument (lookups/validity.py).

The reference never proves lookup outputs are correct (its pipeline Lasso
is the roadmap sketch at prover.zig:351-357); these tests gate our real
implementation: a trace carrying a forged lookup result (wrong ADD/XOR
output) must be rejected — by the honest prover's in-table assertion, and
by the verifier when a malicious prover fabricates the argument around it.
"""

import struct

import numpy as np
import pytest

from zigz_tpu.core.field import BabyBear as F
from zigz_tpu.core.hash import FiatShamirTranscript
from zigz_tpu.lookups.validity import (
    GADGETS,
    SUBTABLES,
    _bitwise_key_eval,
    prove_lookup_validity,
    verify_lookup_validity,
)
from zigz_tpu.proofs.zerocheck import _eq_table
from zigz_tpu.prover.prover import Prover
from zigz_tpu.prover.proof import VerificationResult
from zigz_tpu.prover.serialization import BinarySerializer
from zigz_tpu.verifier.verifier import Verifier

P = F.MODULUS
rng = np.random.default_rng(41)


# -- subtable MLE closed forms ----------------------------------------------


@pytest.mark.parametrize("name", sorted(SUBTABLES))
def test_subtable_key_eval_matches_brute_force(name):
    sub = SUBTABLES[name]
    table = sub.dense_key(P)
    rs = [int(x) for x in rng.integers(0, P, size=sub.num_vars)]
    eq = _eq_table(rs, P)
    brute = int((eq * table % np.uint64(P)).sum(dtype=np.uint64) % np.uint64(P))
    assert sub.key_eval(rs, P) == brute


def test_bitwise_key_eval_on_boolean_points():
    # At boolean points the closed form must reproduce the dense entry.
    table = SUBTABLES["XOR8"].dense_key(P)
    for x in (0, 1, 255, 0x1234, 0xFFFF, 0xABCD):
        rs = [(x >> (15 - j)) & 1 for j in range(16)]
        assert _bitwise_key_eval("XOR", rs, P) == int(table[x])


# -- direct engine round-trips ----------------------------------------------


def _mk_queries(table_id, n):
    """Full 64-bit RV64 query semantics (values deliberately >= 2^32)."""
    in0 = rng.integers(0, 1 << 63, size=n, dtype=np.uint64) * np.uint64(2) \
        + rng.integers(0, 2, size=n, dtype=np.uint64)
    in1 = rng.integers(0, 1 << 63, size=n, dtype=np.uint64) * np.uint64(2) \
        + rng.integers(0, 2, size=n, dtype=np.uint64)
    # Mix in equal pairs and boundary values so eq/compare paths are hit.
    in1[: n // 4] = in0[: n // 4]
    in0[-1], in1[-1] = 0, 0
    if n > 2:
        in0[-2], in1[-2] = 0xFFFFFFFFFFFFFFFF, 0x7FFFFFFFFFFFFFFF
    s0 = in0.view(np.int64)
    s1 = in1.view(np.int64)
    if table_id == 0:
        out = in0 + in1  # uint64 wrap == mod 2^64
    elif table_id == 1:
        out = in0 - in1
    elif table_id == 2:
        out = in0 & in1
    elif table_id == 3:
        out = in0 | in1
    elif table_id == 4:
        out = in0 ^ in1
    elif table_id in (5, 6, 7):
        # Shift tables: only the low 6 bits of in1 matter; keep some rows
        # with garbage upper bits in in1 to exercise the yq binding.
        s = (in1 & np.uint64(63)).astype(np.uint64)
        if table_id == 5:
            out = in0 << s
        elif table_id == 6:
            out = in0 >> s
        else:
            out = (s0 >> s.astype(np.int64)).view(np.uint64)
    elif table_id == 8:
        out = (s0 < s1).astype(np.uint64)
    elif table_id == 9:
        out = (in0 < in1).astype(np.uint64)
    elif table_id == 10:
        f3 = rng.choice([0, 1, 4, 5, 6, 7], size=n).astype(np.uint64)
        taken = np.select(
            [f3 == 0, f3 == 1, f3 == 4, f3 == 5, f3 == 6, f3 == 7],
            [in0 == in1, in0 != in1, s0 < s1, s0 >= s1, in0 < in1, in0 >= in1],
        ).astype(np.uint64)
        return np.stack([in0, in1, f3], axis=1), taken[:, None]
    elif table_id in (13, 14, 15, 16, 17):
        def sext32(v):
            v32 = v & np.uint64(0xFFFFFFFF)
            return np.where(v32 >> np.uint64(31),
                            v32 | np.uint64(0xFFFFFFFF00000000), v32)

        sw = in1 & np.uint64(31)
        if table_id == 13:
            out = sext32(in0 + in1)
        elif table_id == 14:
            out = sext32(in0 - in1)
        elif table_id == 15:
            out = sext32(in0 << sw)
        elif table_id == 16:
            out = sext32((in0 & np.uint64(0xFFFFFFFF)) >> sw)
        else:
            lo32 = (in0 & np.uint64(0xFFFFFFFF)).astype(np.uint32)
            out = sext32((lo32.view(np.int32).astype(np.int64)
                          >> sw.astype(np.int64)).view(np.uint64))
    elif table_id in (18, 19, 20, 21, 22):
        def sext32(v):
            v32 = v & np.uint64(0xFFFFFFFF)
            return np.where(v32 >> np.uint64(31),
                            v32 | np.uint64(0xFFFFFFFF00000000), v32)

        def mulh(sa, sb):
            M = (1 << 64) - 1

            def to_s(v):
                return v - (1 << 64) if v >> 63 else v

            return np.array([
                (((to_s(int(x)) if sa else int(x))
                  * (to_s(int(y)) if sb else int(y))) >> 64) & M
                for x, y in zip(in0, in1)
            ], dtype=np.uint64)

        if table_id == 18:
            out = in0 * in1
        elif table_id == 19:
            out = mulh(True, True)
        elif table_id == 20:
            out = mulh(True, False)
        elif table_id == 21:
            out = mulh(False, False)
        else:
            out = sext32(in0 * in1)
    elif table_id in range(23, 31):
        # (signed, rem, width)
        spec = {23: (True, False, 8), 24: (False, False, 8),
                25: (True, True, 8), 26: (False, True, 8),
                27: (True, False, 4), 28: (False, False, 4),
                29: (True, True, 4), 30: (False, True, 4)}[table_id]
        sg, rem, width = spec
        in1[: n // 6] = 0  # div-by-zero rows
        M = (1 << 64) - 1
        WM = (1 << (8 * width)) - 1
        half = 1 << (8 * width - 1)

        def one(x, y):
            x &= WM
            y &= WM
            if sg:
                xs = x - (WM + 1) if x & half else x
                ys = y - (WM + 1) if y & half else y
                if ys == 0:
                    q, r = -1, xs
                else:
                    q = abs(xs) // abs(ys)
                    if (xs < 0) != (ys < 0):
                        q = -q
                    r = xs - q * ys
            else:
                q, r = (WM, x) if y == 0 else (x // y, x % y)
            v = (r if rem else q) & WM
            if width == 4 and v & 0x80000000:
                v |= 0xFFFFFFFF00000000
            return v & M

        out = np.array([one(int(a), int(b)) for a, b in zip(in0, in1)],
                       dtype=np.uint64)
    else:
        raise AssertionError(table_id)
    return np.stack([in0, in1], axis=1), out[:, None]


@pytest.mark.parametrize("table_id", sorted(GADGETS))
def test_engine_accepts_honest_queries(table_id):
    queries = {table_id: _mk_queries(table_id, 37)}
    lv = prove_lookup_validity(F, FiatShamirTranscript(), queries)
    counts = {table_id: 37}
    assert verify_lookup_validity(F, FiatShamirTranscript(), lv, counts)


@pytest.mark.parametrize("table_id", [8, 9, 10])
def test_engine_forged_compare_output_rejected(table_id):
    """Flipped compare/branch outcome: caught by the honest prover, and a
    self-check-bypassing prover is rejected by the verifier."""
    queries = {table_id: _mk_queries(table_id, 16)}

    def forge(tid, cols):
        cols["o"] = cols["o"].copy()
        cols["o"][2] = 1 - cols["o"][2]

    with pytest.raises(AssertionError, match="lookup validity violated"):
        prove_lookup_validity(F, FiatShamirTranscript(), queries, _forge_hook=forge)
    lv = prove_lookup_validity(
        F, FiatShamirTranscript(), queries, _forge_hook=forge,
        _unsafe_skip_self_checks=True,
    )
    assert not verify_lookup_validity(F, FiatShamirTranscript(), lv, {table_id: 16})


def test_engine_forged_branch_type_rejected():
    """A BNE query relabeled as BEQ (same operands, flipped taken) must
    break the f3-binding/one-hot constraints."""
    queries = {10: _mk_queries(10, 16)}

    def forge(tid, cols):
        cols["f3"] = cols["f3"].copy()
        cols["f3"][1] = 1 - cols["f3"][1] if cols["f3"][1] < 2 else 0
        # selectors left as built for the ORIGINAL f3 -> f3bind breaks

    with pytest.raises(AssertionError, match="lookup validity violated"):
        prove_lookup_validity(F, FiatShamirTranscript(), queries, _forge_hook=forge)
    lv = prove_lookup_validity(
        F, FiatShamirTranscript(), queries, _forge_hook=forge,
        _unsafe_skip_self_checks=True,
    )
    assert not verify_lookup_validity(F, FiatShamirTranscript(), lv, {10: 16})


def test_engine_multi_table_and_counts():
    queries = {t: _mk_queries(t, 10 + t) for t in (0, 2, 4)}
    lv = prove_lookup_validity(F, FiatShamirTranscript(), queries)
    counts = {0: 10, 2: 12, 4: 14, 11: 99}  # 11 = LOAD: no gadget, ignored
    assert verify_lookup_validity(F, FiatShamirTranscript(), lv, counts)
    # Wrong count for a covered table -> reject.
    assert not verify_lookup_validity(
        F, FiatShamirTranscript(), lv, {0: 11, 2: 12, 4: 14}
    )
    # Missing record for a covered table -> reject.
    assert not verify_lookup_validity(
        F, FiatShamirTranscript(), lv, {0: 10, 1: 5, 2: 12, 4: 14}
    )


@pytest.mark.parametrize("table_id", [5, 6, 7])
def test_engine_forged_shift_output_rejected(table_id):
    """Wrong shift result: honest prover catches it; a self-check-bypassing
    prover's argument fails verification (the staged-shifter zerocheck)."""
    queries = {table_id: _mk_queries(table_id, 16)}

    def forge(tid, cols):
        cols["z1"] = cols["z1"].copy()
        cols["z1"][4] = (cols["z1"][4] + 1) % (1 << 16)

    with pytest.raises(AssertionError, match="lookup validity violated"):
        prove_lookup_validity(F, FiatShamirTranscript(), queries, _forge_hook=forge)
    lv = prove_lookup_validity(
        F, FiatShamirTranscript(), queries, _forge_hook=forge,
        _unsafe_skip_self_checks=True,
    )
    assert not verify_lookup_validity(F, FiatShamirTranscript(), lv, {table_id: 16})


def test_engine_forged_shift_amount_rejected():
    """Claiming a different shift amount than y encodes must break the
    y0 = s + 64*yq binding (alpha/beta one-hots left for the forged s)."""
    queries = {6: _mk_queries(6, 16)}

    def forge(tid, cols):
        # Pretend row 3 shifted by s+1: rebuild nothing, just bump y0 so
        # the committed query differs from the shifter's s decomposition.
        cols["y0"] = cols["y0"].copy()
        cols["y0"][3] = (cols["y0"][3] + 1) % (1 << 16)

    with pytest.raises(AssertionError, match="lookup validity violated"):
        prove_lookup_validity(F, FiatShamirTranscript(), queries, _forge_hook=forge)
    lv = prove_lookup_validity(
        F, FiatShamirTranscript(), queries, _forge_hook=forge,
        _unsafe_skip_self_checks=True,
    )
    assert not verify_lookup_validity(F, FiatShamirTranscript(), lv, {6: 16})


@pytest.mark.parametrize("table_id,col", [(0, "z0"), (4, "o2")])
def test_engine_forged_output_caught_by_prover(table_id, col):
    queries = {table_id: _mk_queries(table_id, 16)}

    def forge(tid, cols):
        cols[col] = cols[col].copy()
        cols[col][3] = (cols[col][3] + 1) % (1 << 16 if col == "z0" else 1 << 8)

    with pytest.raises(AssertionError, match="lookup validity violated"):
        prove_lookup_validity(F, FiatShamirTranscript(), queries, _forge_hook=forge)


def test_engine_forged_output_rejected_by_verifier():
    """Malicious prover: forge an XOR chunk output and bypass the
    prover-side self-checks — the argument it can still produce counts
    the nearest VALID entry for the forged row, so the query-side and
    table-side inverse sums diverge and the logUp grand-sum equation (or
    a Ligero sum claim) must fail at verification."""
    queries = {4: _mk_queries(4, 16)}

    def forge(tid, cols):
        cols["o2"] = cols["o2"].copy()
        cols["o2"][3] ^= np.uint64(1)  # wrong XOR output byte

    lv = prove_lookup_validity(
        F, FiatShamirTranscript(), queries, _forge_hook=forge,
        _unsafe_skip_self_checks=True,
    )
    assert not verify_lookup_validity(F, FiatShamirTranscript(), lv, {4: 16})


def test_engine_forged_add_rejected_by_verifier():
    """Forged ADD result: all limbs are still valid RANGE16 entries, so
    the logUp side is consistent — the limb-addition zerocheck constraint
    is what rejects (its hypercube sum is nonzero)."""
    queries = {0: _mk_queries(0, 16)}

    def forge(tid, cols):
        cols["z0"] = cols["z0"].copy()
        cols["z0"][5] = (cols["z0"][5] + 1) % (1 << 16)

    lv = prove_lookup_validity(
        F, FiatShamirTranscript(), queries, _forge_hook=forge,
        _unsafe_skip_self_checks=True,
    )
    assert not verify_lookup_validity(F, FiatShamirTranscript(), lv, {0: 16})


def test_engine_forged_sum_rejected():
    """Tampering the shared inverse sums breaks either the Ligero sum
    claim or the grand-sum equation."""
    queries = {0: _mk_queries(0, 16)}
    lv = prove_lookup_validity(F, FiatShamirTranscript(), queries)
    name = sorted(lv.tables[0].g_sums)[0]
    lv.tables[0].g_sums[name] = (lv.tables[0].g_sums[name] + 1) % P
    assert not verify_lookup_validity(F, FiatShamirTranscript(), lv, {0: 16})

    lv = prove_lookup_validity(F, FiatShamirTranscript(), queries)
    lv.table_side.h_sums["RANGE16"] = (lv.table_side.h_sums["RANGE16"] + 1) % P
    assert not verify_lookup_validity(F, FiatShamirTranscript(), lv, {0: 16})


def test_engine_tampered_roots_rejected():
    queries = {2: _mk_queries(2, 9)}
    lv = prove_lookup_validity(F, FiatShamirTranscript(), queries)
    lv.unified.data_root = bytes(32)
    assert not verify_lookup_validity(F, FiatShamirTranscript(), lv, {2: 9})

    lv = prove_lookup_validity(F, FiatShamirTranscript(), queries)
    lv.unified.advice_root = bytes(32)
    assert not verify_lookup_validity(F, FiatShamirTranscript(), lv, {2: 9})


def test_engine_tampered_column_eval_rejected():
    queries = {0: _mk_queries(0, 16)}
    lv = prove_lookup_validity(F, FiatShamirTranscript(), queries)
    lv.tables[0].zc.column_evals["z0"] = (
        lv.tables[0].zc.column_evals["z0"] + 1
    ) % P
    assert not verify_lookup_validity(F, FiatShamirTranscript(), lv, {0: 16})


# -- end-to-end through the pipeline ----------------------------------------


def _addi(rd, rs1, imm):
    return (imm & 0xFFF) << 20 | rs1 << 15 | rd << 7 | 0x13


def _op(rd, rs1, rs2, funct3, funct7=0):
    return funct7 << 25 | rs2 << 20 | rs1 << 15 | funct3 << 12 | rd << 7 | 0x33


def _bne(rs1, rs2, off):
    imm = off & 0x1FFF
    return (((imm >> 12) & 1) << 31 | ((imm >> 5) & 0x3F) << 25 | rs2 << 20
            | rs1 << 15 | 0b001 << 12 | ((imm >> 1) & 0xF) << 8
            | ((imm >> 11) & 1) << 7 | 0x63)


def _alu_program():
    """ADDI x1, ADDI x2, then ADD/SUB/AND/OR/XOR/shift/SLT/SLTU over
    them, a taken BNE, EBREAK."""
    return struct.pack(
        "<16I",
        _addi(1, 0, 0x2AB),
        _addi(2, 0, 0x173),
        _op(3, 1, 2, 0b000),        # ADD
        _op(4, 1, 2, 0b000, 0x20),  # SUB
        _op(5, 1, 2, 0b111),        # AND
        _op(6, 1, 2, 0b110),        # OR
        _op(7, 1, 2, 0b100),        # XOR
        _op(8, 1, 2, 0b001),        # SLL (s = 0x173 & 63 = 51)
        _op(9, 1, 2, 0b101),        # SRL
        _op(10, 4, 2, 0b101, 0x20),  # SRA (x4 = x1-x2 keeps it simple)
        _op(28, 1, 2, 0b010),       # SLT
        _op(29, 1, 2, 0b011),       # SLTU
        _bne(1, 2, 8),              # taken, skips the next ADDI
        _addi(30, 0, 99),           # skipped
        _addi(31, 0, 7),
        0x00100073,
    )


@pytest.mark.parametrize("version", [2, 3])
def test_alu_program_end_to_end(version):
    program = _alu_program()
    proof = Prover(F, seed=0, protocol_version=version).prove(
        program, 0x1000, None, 1 << 10, None, None
    )
    assert proof.public_io.final_regs[3] == 0x2AB + 0x173
    assert proof.public_io.final_regs[28] == 0  # 0x2AB < 0x173 is false
    assert proof.public_io.final_regs[30] == 0  # branch taken
    assert proof.public_io.final_regs[31] == 7
    assert proof.public_io.final_regs[8] == (0x2AB << 51) % (1 << 64)
    assert proof.public_io.final_regs[9] == 0x2AB >> 51
    assert {r.table_id for r in proof.v2.lookup_validity.tables} == {
        0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10
    }
    assert Verifier(F).verify(proof, program) == VerificationResult.Accept
    ser = BinarySerializer(F)
    data = ser.serialize(proof)
    restored = ser.deserialize(data)
    assert ser.serialize(restored) == data
    assert Verifier(F).verify(restored, program) == VerificationResult.Accept


def test_alu_writes_to_x0_stay_honest():
    """Writes to x0 are discarded (rd_after = 0) but the table entry's
    output is the operation result — extraction must emit the semantic
    output so honest traces keep passing the validity argument."""
    program = struct.pack(
        "<8I",
        _addi(1, 0, 5),
        _addi(2, 0, 7),
        _op(0, 1, 2, 0b000),        # ADD  x0, x1, x2  (result 12, dropped)
        _op(0, 1, 2, 0b100),        # XOR  x0
        _op(0, 1, 2, 0b001),        # SLL  x0
        _op(0, 1, 2, 0b011),        # SLTU x0
        _addi(0, 1, 3),             # ADDI x0, x1, 3
        0x00100073,
    )
    proof = Prover(F, seed=0, protocol_version=2).prove(
        program, 0x1000, None, 1 << 8, None, None
    )
    assert Verifier(F).verify(proof, program) == VerificationResult.Accept
    # The ADD queries carry the semantic outputs, not rd_after.
    add_rec = next(r for r in proof.v2.lookup_validity.tables if r.table_id == 0)
    assert add_rec.num_queries == 4  # 2 ADDI + ADD x0 + ADDI x0


def test_forged_add_output_rejected_end_to_end(monkeypatch):
    """The VERDICT gate: a trace containing a WRONG ADD result is caught.
    Forge the extracted query output for the ADD table; the honest prover
    refuses (in-table assertion), and a proof with a stripped/absent
    validity section is rejected by the verifier."""
    import zigz_tpu.lookups.pipeline_lasso as PL

    program = _alu_program()
    real_extract = PL.extract_table_queries

    def forged_extract(trace):
        q = real_extract(trace)
        inputs, outputs = q[0]
        outputs = outputs.copy()
        outputs[0, 0] ^= np.uint64(4)  # wrong ADD result
        q[0] = (inputs, outputs)
        return q

    monkeypatch.setattr(PL, "extract_table_queries", forged_extract)
    with pytest.raises(AssertionError, match="lookup validity violated"):
        Prover(F, seed=0, protocol_version=2).prove(
            program, 0x1000, None, 1 << 10, None, None
        )


def test_stripped_validity_section_rejected():
    program = _alu_program()
    proof = Prover(F, seed=0, protocol_version=2).prove(
        program, 0x1000, None, 1 << 10, None, None
    )
    proof.v2.lookup_validity = None
    assert Verifier(F).verify(proof, program) != VerificationResult.Accept


def test_validity_records_dropped_rejected():
    program = _alu_program()
    proof = Prover(F, seed=0, protocol_version=2).prove(
        program, 0x1000, None, 1 << 10, None, None
    )
    proof.v2.lookup_validity.tables = proof.v2.lookup_validity.tables[1:]
    assert Verifier(F).verify(proof, program) != VerificationResult.Accept
