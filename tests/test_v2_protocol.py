"""Protocol v2 tests: real constraint zerocheck end-to-end, soundness
probes (corrupted witnesses must be caught), serialization round-trip."""

import numpy as np
import pytest

from zigz_tpu import elf
from zigz_tpu.core.field import BabyBear as F
from zigz_tpu.core.hash import FiatShamirTranscript
from zigz_tpu.guest.programs import fibonacci_guest
from zigz_tpu.proofs.zerocheck import ZerocheckProver, ZerocheckVerifier, eq_eval
from zigz_tpu.prover.prover import Prover
from zigz_tpu.prover.proof import VerificationResult
from zigz_tpu.prover.serialization import BinarySerializer
from zigz_tpu.verifier.verifier import Verifier

rng = np.random.default_rng(11)


def _simple_combiner(cols, alphas, p):
    # C = a0 * A * (1 - A): zero iff A boolean.
    A = cols["A"]
    return np.uint64(alphas[0]) * (A * ((np.uint64(1) + np.uint64(p) - A) % np.uint64(p)) % np.uint64(p)) % np.uint64(p)


def _simple_scalar(col_evals, alphas, p):
    a = col_evals["A"] % p
    return alphas[0] * (a * ((1 - a) % p) % p) % p


def test_zerocheck_accepts_vanishing():
    A = rng.integers(0, 2, size=64, dtype=np.uint64)  # boolean: constraint holds
    proof = ZerocheckProver(F, {"A": A}, _simple_combiner, degree=3).prove(FiatShamirTranscript())
    ok = ZerocheckVerifier(F, _simple_scalar, 1, 3).verify(proof, FiatShamirTranscript())
    assert ok


def test_zerocheck_rejects_violation():
    A = rng.integers(0, 2, size=64, dtype=np.uint64)
    A[17] = 5  # not boolean
    proof = ZerocheckProver(F, {"A": A}, _simple_combiner, degree=3).prove(FiatShamirTranscript())
    ok = ZerocheckVerifier(F, _simple_scalar, 1, 3).verify(proof, FiatShamirTranscript())
    assert not ok


def test_zerocheck_rejects_tampered_rounds():
    A = rng.integers(0, 2, size=64, dtype=np.uint64)
    proof = ZerocheckProver(F, {"A": A}, _simple_combiner, degree=3).prove(FiatShamirTranscript())
    proof.round_evals[2][1] = (proof.round_evals[2][1] + 1) % F.MODULUS
    ok = ZerocheckVerifier(F, _simple_scalar, 1, 3).verify(proof, FiatShamirTranscript())
    assert not ok


def test_zerocheck_rejects_tampered_column_eval():
    A = rng.integers(0, 2, size=64, dtype=np.uint64)
    proof = ZerocheckProver(F, {"A": A}, _simple_combiner, degree=3).prove(FiatShamirTranscript())
    proof.column_evals["A"] = (proof.column_evals["A"] + 1) % F.MODULUS
    ok = ZerocheckVerifier(F, _simple_scalar, 1, 3).verify(proof, FiatShamirTranscript())
    assert not ok


def test_eq_eval_matches_table():
    from zigz_tpu.proofs.zerocheck import _eq_table

    taus = [int(x) for x in rng.integers(0, F.MODULUS, size=4)]
    table = _eq_table(taus, F.MODULUS)
    # eq(tau, b) at hypercube corners picks the table entries (MSB-first).
    for idx in (0, 5, 15):
        bits = [(idx >> (3 - j)) & 1 for j in range(4)]  # tau_1 is MSB
        assert eq_eval(taus, bits, F.MODULUS) == int(table[idx])


# -- end-to-end v2 pipeline ------------------------------------------------

def _prove_v2(program, entry=0x1000, segments=None, tape=None):
    return Prover(F, seed=0, protocol_version=2).prove(
        program, entry, None, 1 << 16, segments, tape
    )


def test_v2_end_to_end_accept():
    guest = fibonacci_guest()
    loaded = elf.load(guest)
    proof = _prove_v2(guest, loaded.entry_pc, loaded.segments, [10])
    assert proof.metadata.version == 2
    assert proof.v2 is not None
    # Real extension-field round evaluations: not all zero.
    flat = [g for row in proof.v2.zerocheck.round_evals for g in row]
    assert any(g.to_ints() != (0, 0, 0, 0) for g in flat)
    # Challenges are genuine BabyBear^4 values (all 4 limbs populated
    # somewhere — a base-field-only draw would zero the high limbs).
    assert any(r.to_ints()[1:] != (0, 0, 0) for r in proof.v2.zerocheck.final_point)
    assert Verifier(F).verify(proof, guest) == VerificationResult.Accept


def test_v2_serialization_roundtrip():
    guest = fibonacci_guest()
    loaded = elf.load(guest)
    proof = _prove_v2(guest, loaded.entry_pc, loaded.segments, [7])
    ser = BinarySerializer(F)
    data = ser.serialize(proof)
    restored = ser.deserialize(data)
    assert restored.metadata.version == 2
    assert Verifier(F).verify(restored, guest) == VerificationResult.Accept
    assert ser.serialize(restored) == data


def test_v2_rejects_tampered_round():
    guest = fibonacci_guest()
    loaded = elf.load(guest)
    proof = _prove_v2(guest, loaded.entry_pc, loaded.segments, [5])
    proof.v2.zerocheck.round_evals[1][2] = proof.v2.zerocheck.round_evals[1][2] + 1
    assert Verifier(F).verify(proof, guest) == VerificationResult.RejectInvalidSumcheck


def test_v2_rejects_tampered_column_eval():
    guest = fibonacci_guest()
    loaded = elf.load(guest)
    proof = _prove_v2(guest, loaded.entry_pc, loaded.segments, [5])
    proof.v2.column_evals["pc"] = (proof.v2.column_evals["pc"] + 1) % F.MODULUS
    assert Verifier(F).verify(proof, guest) == VerificationResult.RejectInvalidSumcheck


def test_v2_rejects_tampered_logup_root():
    guest = fibonacci_guest()
    loaded = elf.load(guest)
    proof = _prove_v2(guest, loaded.entry_pc, loaded.segments, [5])
    tampered = bytearray(proof.v2.unified.advice_root)
    tampered[0] ^= 1
    proof.v2.unified.advice_root = bytes(tampered)
    assert Verifier(F).verify(proof, guest) != VerificationResult.Accept


def test_v2_rejects_oversized_nonce():
    """The verifier caps the logUp retry nonce — the grinding knob the
    round-2 verdict flagged is verifier-enforced now."""
    from zigz_tpu.core.ext4 import MAX_NONCE

    guest = fibonacci_guest()
    loaded = elf.load(guest)
    proof = _prove_v2(guest, loaded.entry_pc, loaded.segments, [5])
    assert proof.v2.logup_nonce <= MAX_NONCE
    proof.v2.logup_nonce = MAX_NONCE + 1
    assert Verifier(F).verify(proof, guest) != VerificationResult.Accept


def test_v2_rejects_tampered_opening_point():
    guest = fibonacci_guest()
    loaded = elf.load(guest)
    proof = _prove_v2(guest, loaded.entry_pc, loaded.segments, [5])
    wc = proof.witness_commitments[3]
    wc.point[0] = wc.point[0].add(F.one())
    assert Verifier(F).verify(proof, guest) == VerificationResult.RejectInvalidCommitment


def test_v2_v1_coexist():
    """v1 proofs still verify with the v1 schedule; v2 and v1 proofs of the
    same program differ in bytes but both Accept under their versions."""
    guest = fibonacci_guest()
    loaded = elf.load(guest)
    ser = BinarySerializer(F)
    p1 = Prover(F, seed=0, protocol_version=1).prove(guest, loaded.entry_pc, None, 1 << 16, loaded.segments, [6])
    p2 = Prover(F, seed=0, protocol_version=2).prove(guest, loaded.entry_pc, None, 1 << 16, loaded.segments, [6])
    assert ser.serialize(p1) != ser.serialize(p2)
    assert Verifier(F).verify(p1, guest) == VerificationResult.Accept
    assert Verifier(F).verify(p2, guest) == VerificationResult.Accept


def test_v2_constraint_violation_caught():
    """Corrupt the witness behind the prover's back: patch the zerocheck
    input columns so a constraint is violated -> the extension zerocheck
    rejects.  Builds the full 6-constraint v2 combiner (incl. the logUp
    coordinate columns) exactly as the pipeline does."""
    from zigz_tpu.constraints.v2 import (
        NUM_V2_ALPHAS,
        V2_DEGREE,
        logup_public_tables,
        make_v2_combiner,
        v2_public_evals,
    )
    from zigz_tpu.core.ext4 import Ext4
    from zigz_tpu.poly.public_mles import np_inv
    from zigz_tpu.proofs.zerocheck import ZerocheckExtProver, ZerocheckExtVerifier

    p = F.MODULUS
    n = 32
    cols = {
        "x0": np.zeros(n, dtype=np.uint64),
        "is_read": rng.integers(0, 2, size=n, dtype=np.uint64),
        "pc": (np.arange(n, dtype=np.uint64) * 4 + 0x1000),
        "seq": np.ones(n, dtype=np.uint64),
        "next_pc": (np.arange(n, dtype=np.uint64) * 4 + 0x1004),
    }
    # Violation: one step claims a non-sequential jump while seq=1.
    cols["next_pc"][9] = 0x9999
    tau = Ext4(rng.integers(0, p, size=4, dtype=np.uint64))
    beta = Ext4(rng.integers(0, p, size=4, dtype=np.uint64))
    pub = logup_public_tables(n, 5, p)
    # Pointwise-honest g columns (c5/c6 hold; only c4 is violated).
    fp1 = tau - beta * ((pub["__idx__"] + np.uint64(1)) % np.uint64(p)) - cols["next_pc"]
    fp2 = tau - beta * pub["__idx__"] - cols["pc"]
    g1 = pub["__sel1__"] * fp1.inv()
    g2 = pub["__sel2__"] * fp2.inv()
    zcols = dict(cols)
    zcols.update(pub)
    for e in range(4):
        zcols[f"g1#{e}"] = g1.c[e]
        zcols[f"g2#{e}"] = g2.c[e]
    proof = ZerocheckExtProver(
        F, zcols, make_v2_combiner(tau, beta), V2_DEGREE, num_alphas=NUM_V2_ALPHAS
    ).prove(FiatShamirTranscript())
    ok = ZerocheckExtVerifier(
        F, make_v2_combiner(tau, beta), NUM_V2_ALPHAS, V2_DEGREE,
        public_evals=v2_public_evals(n, 5, p),
    ).verify(proof, FiatShamirTranscript())
    assert not ok


def test_zerocheck_rejects_empty_round_list():
    # A zero-round proof with empty final_point and zero evals must not
    # pass vacuously (eq over an empty challenge list is 1, claim stays 0).
    from zigz_tpu.proofs.zerocheck import ZerocheckProof

    forged = ZerocheckProof(
        num_vars=6, degree=3, round_evals=[], final_point=[],
        column_evals={"A": 0},
    )
    ok = ZerocheckVerifier(F, _simple_scalar, 1, 3).verify(forged, FiatShamirTranscript())
    assert not ok


def test_v2_rejects_large_modulus_fields():
    # v2 hot paths are exact only for p < 2^31; larger presets must be
    # rejected up front instead of producing rejected honest proofs.
    from zigz_tpu.core.field import Goldilocks

    program = bytes([
        0x93, 0x00, 0x10, 0x00,  # ADDI x1, x0, 1
        0x73, 0x00, 0x10, 0x00,  # EBREAK
    ])
    with pytest.raises(ValueError, match="BabyBear-only"):
        Prover(Goldilocks, seed=0, protocol_version=2).prove(
            program, 0x1000, None, 100, None, None
        )


def test_v2_rejects_forged_merkle_directions():
    # verify_at_index derives direction bits from the checked index, so a
    # path whose directions authenticate a different leaf must fail even
    # when the siblings/directions pair is internally consistent.
    from zigz_tpu.commitments.merkle import SimpleMerkleTree

    values = np.arange(8, dtype=np.uint64)
    tree = SimpleMerkleTree.build(F, values)
    honest = tree.open(3)
    assert SimpleMerkleTree.verify_at_index(F, tree.get_root(), honest, 3)

    # Open leaf 2 but claim index 3: the trusting v1 verify accepts the
    # (siblings, directions) pair; the strict variant must reject.
    forged = tree.open(2)
    forged.index = 3
    assert SimpleMerkleTree.verify(F, tree.get_root(), forged)
    assert not SimpleMerkleTree.verify_at_index(F, tree.get_root(), forged, 3)

    # Truncated path (valid subtree proof at wrong depth) must also fail.
    short = tree.open(3)
    short.path.siblings = short.path.siblings[:2]
    short.path.directions = short.path.directions[:2]
    assert not SimpleMerkleTree.verify_at_index(F, tree.get_root(), short, 3)


def _prove_v2_simple(program):
    return Prover(F, seed=0, protocol_version=2).prove(program, 0x1000, None, 1 << 10, None, None)


def _nop_add_program():
    return bytes([0x93, 0x00, 0x30, 0x00, 0x13, 0x01, 0x40, 0x00]
                 + [0xB3, 0x81, 0x20, 0x00] * 29 + [0x73, 0x00, 0x10, 0x00])


def test_v2_rejects_tampered_pcs_root():
    program = _nop_add_program()
    proof = _prove_v2_simple(program)
    proof.v2.unified.data_root = bytes(32)
    assert Verifier(F).verify(proof, program) != VerificationResult.Accept


def test_v2_rejects_missing_pcs():
    program = _nop_add_program()
    proof = _prove_v2_simple(program)
    proof.v2.unified.data_open = None
    assert Verifier(F).verify(proof, program) == VerificationResult.RejectInvalidCommitment


def test_v2_rejects_tampered_pcs_column():
    program = _nop_add_program()
    proof = _prove_v2_simple(program)
    op = proof.v2.unified.data_open
    op.columns[3][1] = (int(op.columns[3][1]) + 1) % F.MODULUS
    assert Verifier(F).verify(proof, program) == VerificationResult.RejectInvalidCommitment


# -- register memory check (constraints/regcheck.py) ------------------------

def test_v2_rejects_missing_regcheck():
    program = _nop_add_program()
    proof = _prove_v2_simple(program)
    assert proof.v2.regcheck is not None
    proof.v2.regcheck = None
    assert (
        Verifier(F).verify(proof, program)
        == VerificationResult.RejectInvalidRegisterAccess
    )


def test_v2_rejects_tampered_regcheck_over_wire():
    """Tamper the deserialized regcheck multiset sum: the logUp grand
    equation (or its Ligero sum binding) must fail."""
    program = _nop_add_program()
    proof = _prove_v2_simple(program)
    ser = BinarySerializer(F)
    restored = ser.deserialize(ser.serialize(proof))
    restored.v2.regcheck.g_sums["g_r1"] = (
        restored.v2.regcheck.g_sums["g_r1"] + 1
    ) % F.MODULUS
    assert (
        Verifier(F).verify(restored, program)
        == VerificationResult.RejectInvalidRegisterAccess
    )


def test_v2_rejects_forged_regcheck_final_ts():
    program = _nop_add_program()
    proof = _prove_v2_simple(program)
    proof.v2.regcheck.final_ts[5] = (proof.v2.regcheck.final_ts[5] + 1) % (1 << 32)
    assert (
        Verifier(F).verify(proof, program)
        == VerificationResult.RejectInvalidRegisterAccess
    )


def test_v2_regcheck_covers_ecall_read_writes():
    """ECALL_READ writes a0 though the instruction's rd is 0; the access
    model must still balance (the fibonacci guest consumes the tape)."""
    guest = fibonacci_guest()
    loaded = elf.load(guest)
    proof = _prove_v2(guest, loaded.entry_pc, loaded.segments, [9])
    assert proof.v2.regcheck is not None
    assert Verifier(F).verify(proof, guest) == VerificationResult.Accept


def test_v2_logup_nonce_grinding_fails():
    """Adaptive-grinding regression (round-2 verdict weak #1): forge the
    PC chain, then grind the ENTIRE allowed nonce space looking for a
    (tau, beta) draw that balances the forged multiset.  With BabyBear^4
    challenges each nonce succeeds with probability ~2n/p^4 (~2^-100), so
    every attempt must fail; the verifier rejects nonce > MAX_NONCE, so
    this is the attacker's whole search space."""
    import numpy as np

    from zigz_tpu.constraints.v2 import logup_public_tables
    from zigz_tpu.core.ext4 import MAX_NONCE, challenge_ext
    from zigz_tpu.core.hash import FiatShamirTranscript

    num_steps, num_vars = 13, 4
    p = F.MODULUS
    size = 1 << num_vars
    pc = (np.arange(size, dtype=np.uint64) * 4 + 0x1000) % np.uint64(p)
    next_pc = (pc + 4) % np.uint64(p)
    # Forgery: claim step 5 jumped elsewhere without a matching pc entry.
    next_pc_forged = next_pc.copy()
    next_pc_forged[5] = (next_pc_forged[5] + 8) % np.uint64(p)

    pub = logup_public_tables(num_steps, num_vars, p)
    idx, sel1, sel2 = pub["__idx__"], pub["__sel1__"], pub["__sel2__"]

    # Attacker state right before the nonce draws (any transcript prefix
    # works for the property; the real prefix is just a different seed).
    base = FiatShamirTranscript()
    base.append_bytes(b"grinding-regression")

    balanced = 0
    for nonce in range(MAX_NONCE + 1):
        trial = base.fork()
        trial.append_bytes(b"V2_LOGUP_NONCE")
        trial.append_u64(nonce)
        tau = challenge_ext(trial)
        beta = challenge_ext(trial)
        fp1 = tau - beta * ((idx + np.uint64(1)) % np.uint64(p)) - next_pc_forged
        fp2 = tau - beta * idx - pc
        if np.any(fp1.is_zero() & (sel1 == 1)) or np.any(fp2.is_zero() & (sel2 == 1)):
            continue  # zero denominator: this nonce is unusable anyway
        s1 = (sel1 * fp1.inv()).sum()
        s2 = (sel2 * fp2.inv()).sum()
        if s1 == s2:
            balanced += 1
    assert balanced == 0, "forged multiset balanced under some nonce"


def test_v2_lasso_layer_forgery_cannot_carry_execution():
    """PROVER.md "non-load-bearing exceptions" turned into a test (round-3
    verdict task 8): the pipeline-Lasso layer's per-table sumchecks run
    over BASE-field round challenges, so an attacker may treat that whole
    layer as grindable/cooperative.  Model the strongest such attacker:
    the Lasso layer consumes the FORGED query multiset consistently (its
    commitments, claimed sums, and sumcheck rounds are all honest *for
    the forged queries*, so that layer verifies), while an ADD lookup's
    output is off by one.  The execution proof must still be rejected —
    lookup soundness is carried by the extension-field validity + linkage
    logUp arguments, not by the Lasso layer."""
    import numpy as np

    from zigz_tpu.guest.asm import Assembler
    from zigz_tpu.lookups import pipeline_lasso as pl

    # A program with a real ADD: li a0, 5; li a1, 7; add a2, a0, a1; ebreak
    a = Assembler()
    a.addi(10, 0, 5)
    a.addi(11, 0, 7)
    a.add(12, 10, 11)
    a.ebreak()
    program = a.assemble()

    orig = pl.extract_table_queries

    def forged_extract(trace):
        queries = {tid: (ins, outs.copy())
                   for tid, (ins, outs) in orig(trace).items()}
        # Find the table carrying the 5+7 query and bump its result.
        for tid, (ins, outs) in queries.items():
            hit = np.nonzero((ins[:, 0] == 5) & (ins[:, 1] == 7))[0]
            if len(hit):
                outs[hit[0]] = (outs[hit[0]] + 1) % (1 << 32)
                return queries
        raise AssertionError("ADD query not found in extracted tables")

    p = Prover(F, seed=0, protocol_version=2)
    # Skip the honest prover's self-checks so the forged proof is emitted.
    p._lv_unsafe = True
    p._mc_unsafe = True
    p._bc_unsafe = True
    pl.extract_table_queries = forged_extract
    try:
        proof = p.prove(program, 0x1000, None, 1 << 10, None, None)
    finally:
        pl.extract_table_queries = orig
    assert Verifier(F).verify(proof, program) != VerificationResult.Accept
