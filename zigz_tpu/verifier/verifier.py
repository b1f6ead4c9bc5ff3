"""Proof verifier — exact transcript replay semantics.

Reference: /root/reference/src/verifier/verifier.zig.  The verifier's
transcript schedule intentionally differs from the prover's (it binds
"SUMCHECK_BEGIN"+F(num_vars) only, squeezes challenges WITHOUT absorbing the
round coefficients, and absorbs the per-round evaluation instead,
:182-238); it never compares its challenges with the proof's, so the
checks that actually bite are:

* SHA-256(program) == proof.program_hash, else ProgramHashMismatch (:100-107);
* round-0 g(0)+g(1) == claimed_sum, where claimed_sum is taken from
  proof.final_eval (:190-214) — all-zero placeholder rounds pass with 0;
* per-opening: claim == proof.value AND the Merkle path verifies (:269-294).

Soundness of the v1 scheme rests on transcript divergence + Merkle binding
(SURVEY.md §2.9); the real constraint verifier is the v2 protocol in
zigz_tpu/proofs/.  Replicated bit-for-bit so both stacks accept each
other's proofs.
"""

from __future__ import annotations

from ..commitments.commit import CommitmentScheme, PolynomialCommitment
from ..core.hash import FiatShamirTranscript, sha256
from ..prover.proof import (
    PipelineLassoProof,
    PipelineSumcheckProof,
    Proof,
    PublicIO,
    VerificationResult,
)

__all__ = ["Verifier", "ProgramHashMismatch"]


class ProgramHashMismatch(Exception):
    pass


class Verifier:
    """Verifier(F) twin (verifier.zig:26-301)."""

    def __init__(self, F):
        self.F = F
        self.transcript = FiatShamirTranscript()

    def verify(self, proof: Proof, program: bytes) -> str:
        if proof.metadata.version in (2, 3, 4):
            return self.verify_v2(proof, program)

        # Fresh transcript (verifier.zig:55).
        self.transcript = FiatShamirTranscript()

        # PHASE 1: public inputs (must match prover order).
        self._bind_public_inputs(proof.public_io, program)

        # PHASE 2: commitment roots.
        self._bind_polynomial_commitments(proof.witness_commitments)

        # PHASE 3: burn opening-point challenges + bind claims (Jolt PR #981).
        self._derive_and_bind_opening_claims(proof.witness_commitments)

        # PHASE 4: constraint sumcheck.
        if self._verify_sumcheck_proof(proof.constraint_proof) != VerificationResult.Accept:
            return VerificationResult.RejectInvalidSumcheck

        # PHASE 5: Lasso proofs.
        from ..prover.proof import CompactLassoList

        if isinstance(proof.lookup_proofs, CompactLassoList):
            self._verify_lasso_proofs_compact(proof.lookup_proofs)
        else:
            for lasso in proof.lookup_proofs:
                if self._verify_lasso_proof(lasso) != VerificationResult.Accept:
                    return VerificationResult.RejectInvalidLookup

        # PHASE 6: openings.
        for opening in proof.witness_commitments:
            if self._verify_opening(opening) != VerificationResult.Accept:
                return VerificationResult.RejectInvalidCommitment

        return VerificationResult.Accept

    # ------------------------------------------------------------------
    def verify_v2(self, proof: Proof, program: bytes) -> str:
        """Protocol v2: replay the PROVER's exact transcript schedule and
        verify the real constraint zerocheck (constraints/v2.py), then the
        v1-style opening checks — plus the aux-column openings and a
        point/index consistency check the v1 verifier omits.

        Version 3 is the same protocol with Poseidon2-over-BabyBear as the
        Merkle hasher (commitment forests only; the Fiat-Shamir transcript
        stays SHA3)."""
        from ..commitments.merkle import SimpleMerkleTree, hasher_for_mode

        hasher = hasher_for_mode(
            "poseidon2" if proof.metadata.version == 3 else "sha3"
        )
        from ..constraints.v2 import (
            NUM_V2_ALPHAS,
            V2_DEGREE,
            V2_G_COLUMNS,
            make_v2_combiner,
            v2_public_evals,
        )
        from ..core.ext4 import MAX_NONCE, Ext4, challenge_ext
        from ..prover.proof import CompactLassoList
        from ..proofs.zerocheck import ZerocheckExtVerifier, absorb_ext

        F = self.F
        if proof.v2 is None:
            return VerificationResult.RejectInvalidSumcheck
        self.transcript = FiatShamirTranscript()
        transcript = self.transcript

        # Public inputs (prover order).
        self._bind_public_inputs(proof.public_io, program)

        # Constraint phase bindings (prover order: steps then vars).
        transcript.append_bytes(b"SUMCHECK_BEGIN")
        transcript.append_field_element(F, F(proof.public_io.num_steps))
        transcript.append_field_element(F, F(proof.metadata.num_vars))

        # Ligero PCS root bound before any zerocheck challenge.
        if proof.v2.pcs_root is None or proof.v2.pcs_proof is None:
            return VerificationResult.RejectInvalidCommitment
        transcript.append_bytes(b"V2_PCS_COMMIT")
        transcript.append_bytes(proof.v2.pcs_root)

        # v4: the full-witness Ligero root, bound before any zerocheck
        # challenge (prover order).
        if proof.metadata.version >= 4:
            if (
                proof.v2.witness_root is None
                or proof.v2.witness_evals is None
                or proof.v2.witness_proof is None
            ):
                return VerificationResult.RejectInvalidCommitment
            transcript.append_bytes(b"V4_WITNESS_COMMIT")
            transcript.append_bytes(proof.v2.witness_root)

        # PC-chain logUp replay: nonce-bound BabyBear^4 tau/beta draw, then
        # the g1/g2 coordinate-column commitment + shared extension sum
        # (constraints/v2.py c5/c6).  The nonce cap bounds retry grinding.
        if proof.v2.logup_root is None or proof.v2.logup_proof is None:
            return VerificationResult.RejectInvalidCommitment
        p = F.MODULUS
        if not (0 <= proof.v2.logup_nonce <= MAX_NONCE):
            return VerificationResult.RejectInvalidSumcheck
        transcript.append_bytes(b"V2_LOGUP_NONCE")
        transcript.append_u64(proof.v2.logup_nonce)
        tau_lu = challenge_ext(transcript)
        beta_lu = challenge_ext(transcript)
        logup_sum = proof.v2.logup_sum
        if not isinstance(logup_sum, Ext4):
            return VerificationResult.RejectInvalidSumcheck
        transcript.append_bytes(b"V2_LOGUP_COMMIT")
        transcript.append_bytes(proof.v2.logup_root)
        absorb_ext(transcript, logup_sum)

        # Extension zerocheck replay + algebraic check (the combiner's
        # public idx/selector MLE values are computed by the verifier at
        # the extension final point — the c5/c6 terms only trust the
        # committed g/pc/next_pc evals, which the Ligero arguments below
        # bind).
        num_steps = proof.public_io.num_steps
        zc_proof = proof.v2.zerocheck
        if zc_proof is None or zc_proof.num_vars != proof.metadata.num_vars:
            return VerificationResult.RejectInvalidSumcheck
        if zc_proof.degree != V2_DEGREE:
            return VerificationResult.RejectInvalidSumcheck
        required_evals = {"x0", "is_read", "pc", "seq", "next_pc"} | set(V2_G_COLUMNS)
        if set(zc_proof.column_evals) != required_evals:
            return VerificationResult.RejectInvalidSumcheck
        if proof.v2.column_evals is not zc_proof.column_evals:
            if proof.v2.column_evals != zc_proof.column_evals:
                return VerificationResult.RejectInvalidSumcheck
        zc_ok = ZerocheckExtVerifier(
            F,
            make_v2_combiner(tau_lu, beta_lu),
            NUM_V2_ALPHAS,
            V2_DEGREE,
            public_evals=v2_public_evals(num_steps, proof.metadata.num_vars, p),
        ).verify(zc_proof, transcript)
        if not zc_ok:
            return VerificationResult.RejectInvalidSumcheck
        final_point = zc_proof.final_point

        # Ligero evaluation argument: the terminal column_evals must be
        # consistent with the committed columns at the zerocheck point —
        # the REAL evaluation binding (commitments/ligero.py).
        from ..commitments.ligero import (
            LigeroClaim,
            LigeroParams,
            _row_col_weights,
            ligero_verify_claims,
            ligero_verify_eval,
        )

        hash_mode = "poseidon2" if proof.metadata.version == 3 else "sha3"
        witness_col_names = ["is_read", "next_pc", "pc", "seq", "x0"]
        if not ligero_verify_eval(
            F,
            proof.v2.pcs_root,
            proof.metadata.num_vars,
            witness_col_names,
            proof.v2.column_evals,
            final_point,
            proof.v2.pcs_proof,
            transcript,
            hash_mode,
        ):
            return VerificationResult.RejectInvalidCommitment

        # v4: the witness PCS opened at the SAME zerocheck point.  The
        # evals shared with the small zerocheck commitment must agree
        # (binds the two commitments to one witness), and every one of
        # the 43 column evals is proven against the committed matrix.
        if proof.metadata.version >= 4:
            from ..constraints.witness import WITNESS_POLY_NAMES

            wit_names = sorted(WITNESS_POLY_NAMES)
            wev = proof.v2.witness_evals
            if set(wev) != set(wit_names):
                return VerificationResult.RejectInvalidCommitment
            if not all(isinstance(v, Ext4) for v in wev.values()):
                return VerificationResult.RejectInvalidCommitment
            cev = proof.v2.column_evals
            if (
                wev["pc"] != cev["pc"]
                or wev["x0"] != cev["x0"]
                or wev["mem_is_read"] != cev["is_read"]
            ):
                return VerificationResult.RejectInvalidCommitment
            transcript.append_bytes(b"V4_WITNESS_EVALS")
            for name in wit_names:
                absorb_ext(transcript, wev[name])
            if not ligero_verify_eval(
                F,
                proof.v2.witness_root,
                proof.metadata.num_vars,
                wit_names,
                wev,
                final_point,
                proof.v2.witness_proof,
                transcript,
                hash_mode,
            ):
                return VerificationResult.RejectInvalidCommitment

        # logUp Ligero argument: claim 1 binds the g1/g2 coordinate-column
        # terminal evals at the zerocheck point; claim 2 binds each
        # coordinate's hypercube sum to the matching logup_sum coordinate —
        # together sum(g1) == sum(g2) == logup_sum.  With c5/c6 this is the
        # complete PC-chain multiset check.
        import numpy as np

        g_names = sorted(V2_G_COLUMNS)
        lp = LigeroParams()
        cn = lp.choose_split(proof.metadata.num_vars, len(g_names))
        lg_m = (1 << proof.metadata.num_vars) >> cn
        a_eval, b_eval = _row_col_weights(final_point, cn)
        sum_values = {}
        for name in g_names:
            e = int(name.split("#")[1])
            sum_values[name] = int(logup_sum.c[e])
        claims = [
            LigeroClaim(a=a_eval, b=b_eval, values={
                name: zc_proof.column_evals[name] for name in g_names
            }),
            LigeroClaim(
                a=np.ones(lg_m, dtype=np.uint64),
                b=np.ones(1 << cn, dtype=np.uint64),
                values=sum_values,
            ),
        ]
        if not ligero_verify_claims(
            F,
            proof.v2.logup_root,
            proof.metadata.num_vars,
            g_names,
            claims,
            proof.v2.logup_proof,
            transcript,
            hash_mode,
        ):
            return VerificationResult.RejectInvalidCommitment

        # Lasso phase: real per-table sumchecks (lookups/pipeline_lasso.py).
        from ..lookups.pipeline_lasso import verify_pipeline_lasso

        transcript.append_bytes(b"LASSO_BEGIN")
        if not verify_pipeline_lasso(
            F, transcript, proof.lookup_proofs, proof.v2.lasso_extras or {}
        ):
            return VerificationResult.RejectInvalidLookup

        # Lookup validity: every gadget-covered query multiset must be
        # proven to consist of genuine table entries (lookups/validity.py).
        from ..lookups.validity import LookupValidityProof, verify_lookup_validity

        lasso_counts = {l.table_id: l.num_lookups for l in proof.lookup_proofs}
        lv = proof.v2.lookup_validity
        if lv is None:
            lv = LookupValidityProof(nonce=0, tables=[], table_side=None)
        if not verify_lookup_validity(F, transcript, lv, lasso_counts, hash_mode):
            return VerificationResult.RejectInvalidLookup

        # Register-file offline memory check (constraints/regcheck.py):
        # reads must return last-written values, anchored at the PUBLIC
        # initial/final register state from PublicIO.
        from ..constraints.regcheck import verify_regcheck

        if proof.v2.regcheck is None:
            return VerificationResult.RejectInvalidRegisterAccess
        io = proof.public_io
        if not verify_regcheck(
            F, transcript, proof.v2.regcheck, proof.metadata.num_steps,
            proof.metadata.num_vars, io.initial_regs,
            io.final_regs or [0] * 32, hash_mode,
        ):
            return VerificationResult.RejectInvalidRegisterAccess

        # RAM byte-level offline memory check (constraints/memcheck.py):
        # loads must return last-stored bytes, anchored at the PUBLIC
        # initial memory image the verifier rebuilds from the program.
        from ..constraints.memcheck import initial_memory_map, verify_memcheck

        if proof.v2.memcheck is None:
            return VerificationResult.RejectInvalidMemoryAccess
        init_mem = initial_memory_map(program, io.initial_pc)
        if not verify_memcheck(
            F, transcript, proof.v2.memcheck, proof.metadata.num_steps,
            init_mem, hash_mode,
        ):
            return VerificationResult.RejectInvalidMemoryAccess

        # Bytecode fetch+decode argument (constraints/bytecode.py): each
        # step's decoded tuple must equal the PUBLIC program's decode at
        # its pc (the verifier decodes the program itself), with pc(0)
        # anchored at the public entry point.
        from ..constraints.bytecode import verify_bytecode
        from ..constraints.regcheck import COLUMNS as RC_COLUMNS

        if proof.v2.bytecode is None:
            return VerificationResult.RejectInvalidBytecode
        if not verify_bytecode(
            F, transcript, proof.v2.bytecode, program, io.initial_pc,
            proof.metadata.num_steps, proof.metadata.num_vars,
            proof.v2.regcheck.root_cols, sorted(RC_COLUMNS),
            proof.v2.pcs_root, sorted(["x0", "is_read", "pc", "seq", "next_pc"]),
            hash_mode, outputs=io.outputs, final_pc=io.final_pc,
            lv_tables=(proof.v2.lookup_validity.tables
                       if proof.v2.lookup_validity is not None else []),
            mc=proof.v2.memcheck,
        ):
            return VerificationResult.RejectInvalidBytecode

        num_vars = proof.metadata.num_vars
        if proof.metadata.version < 4:
            # Commitment phase: bind roots, re-derive points, CHECK them.
            # (v4 has no per-column Merkle forest — the Ligero witness PCS
            # above replaces this phase entirely.)
            if len(proof.witness_commitments) != 43:
                return VerificationResult.RejectInvalidCommitment
            transcript.append_bytes(b"POLY_COMMITMENTS")
            for c in proof.witness_commitments:
                transcript.append_bytes(c.commitment)
            for c in proof.witness_commitments:
                point = [transcript.challenge(F) for _ in range(num_vars)]
                # v2 tightening: the proof's point and opened index must
                # match the re-derived challenges (v1 never checks these).
                if [x.value for x in c.point] != [x.value for x in point]:
                    return VerificationResult.RejectInvalidCommitment
                expected_index = point[0].value % (1 << num_vars) if num_vars else 0
                if c.proof.merkle_proof.index != expected_index:
                    return VerificationResult.RejectInvalidCommitment
            transcript.append_bytes(b"OPENING_CLAIMS")
            for c in proof.witness_commitments:
                transcript.append_field_element(F, c.value)

            # Opening checks — v2 tightening: the Merkle walk derives
            # direction bits from the CHECKED index and requires a
            # full-height path (merkle.verify_at_index), so proof-supplied
            # directions cannot authenticate a different leaf.
            for opening in proof.witness_commitments:
                if not opening.value.eql(opening.proof.value):
                    return VerificationResult.RejectInvalidCommitment
                if not SimpleMerkleTree.verify_at_index(
                    F, opening.commitment, opening.proof.merkle_proof, num_vars,
                    hasher=hasher,
                ):
                    return VerificationResult.RejectInvalidCommitment

        return VerificationResult.Accept

    def _bind_public_inputs(self, public_io: PublicIO, program: bytes) -> None:
        """verifier.zig:95-122."""
        F = self.F
        program_hash = sha256(program)
        if program_hash != public_io.program_hash:
            raise ProgramHashMismatch()
        self.transcript.append_bytes(program_hash)
        self.transcript.append_field_element(F, F(public_io.initial_pc))
        if public_io.initial_regs:
            for reg_val in public_io.initial_regs:
                self.transcript.append_field_element(F, F(reg_val))

    def _bind_polynomial_commitments(self, commitments) -> None:
        """verifier.zig:126-137."""
        self.transcript.append_bytes(b"POLY_COMMITMENTS")
        for c in commitments:
            self.transcript.append_bytes(c.commitment)

    def _derive_and_bind_opening_claims(self, commitments) -> None:
        """verifier.zig:146-179 — burn 43*v challenges, then bind claims."""
        F = self.F
        for c in commitments:
            for _ in c.point:
                self.transcript.challenge(F)
        self.transcript.append_bytes(b"OPENING_CLAIMS")
        for c in commitments:
            self.transcript.append_field_element(F, c.value)

    def _verify_sumcheck_proof(self, sc: PipelineSumcheckProof) -> str:
        """verifier.zig:182-238 — round-0 check vs proof.final_eval;
        challenge + per-round eval absorbed (NOT the coefficients)."""
        F = self.F
        self.transcript.append_bytes(b"SUMCHECK_BEGIN")
        self.transcript.append_field_element(F, F(sc.num_vars))

        claimed_sum = sc.final_eval

        for rnd, round_poly in enumerate(sc.round_polynomials):
            g0 = round_poly[0]
            g1 = F.zero()
            for coeff in round_poly:
                g1 = g1.add(coeff)

            if rnd == 0:
                if not g0.add(g1).eql(claimed_sum):
                    return VerificationResult.RejectInvalidSumcheck

            challenge = self.transcript.challenge(F)

            ev = F.zero()
            power = F.one()
            for coeff in round_poly:
                ev = ev.add(coeff.mul(power))
                power = power.mul(challenge)
            self.transcript.append_field_element(F, ev)

        return VerificationResult.Accept

    def _verify_lasso_proof(self, lasso: PipelineLassoProof) -> str:
        """verifier.zig:240-267."""
        F = self.F
        self.transcript.append_bytes(b"LASSO_BEGIN")
        self.transcript.append_bytes(b"LASSO_TABLE")
        self.transcript.append_field_element(F, F(lasso.table_id))

        if self._verify_sumcheck_proof(lasso.multiset_proof) != VerificationResult.Accept:
            return VerificationResult.RejectInvalidLookup

        if lasso.subtable_proofs:
            for sub in lasso.subtable_proofs:
                if self._verify_sumcheck_proof(sub) != VerificationResult.Accept:
                    return VerificationResult.RejectInvalidLookup

        return VerificationResult.Accept

    def _verify_lasso_proofs_compact(self, proofs) -> None:
        """Batched transcript absorption for uniform filler proofs.

        Per proof the verifier absorbs "LASSO_BEGIN" + "LASSO_TABLE" +
        LE64(table_id mod p) + "SUMCHECK_BEGIN" + LE64(0) and runs zero
        rounds (always Accept) — one update() replaces len(proofs) Python
        iterations, byte-identical to the slow path (verifier.zig:240-267
        semantics preserved)."""
        import numpy as np

        n = len(proofs)
        if n == 0:
            return
        F = self.F
        head = b"LASSO_BEGINLASSO_TABLE"
        tail = b"SUMCHECK_BEGIN" + b"\x00" * 8
        stride = len(head) + 8 + len(tail)
        ids = np.arange(n, dtype=np.uint64) % np.uint64(F.MODULUS)
        stream = np.empty((n, stride), dtype=np.uint8)
        stream[:, : len(head)] = np.frombuffer(head, dtype=np.uint8)
        stream[:, len(head) : len(head) + 8] = np.frombuffer(
            np.ascontiguousarray(ids, dtype="<u8").tobytes(), dtype=np.uint8
        ).reshape(n, 8)
        stream[:, len(head) + 8 :] = np.frombuffer(tail, dtype=np.uint8)
        self.transcript.append_bytes(stream.tobytes())

    def _verify_opening(self, opening) -> str:
        """verifier.zig:269-294."""
        if not opening.value.eql(opening.proof.value):
            return VerificationResult.RejectInvalidCommitment
        poly_commit = PolynomialCommitment(opening.commitment, len(opening.point))
        if not CommitmentScheme.verify(self.F, poly_commit, opening.proof):
            return VerificationResult.RejectInvalidCommitment
        return VerificationResult.Accept
