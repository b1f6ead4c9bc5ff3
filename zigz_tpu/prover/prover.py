"""The end-to-end proving pipeline (v1, wire-compatible with the reference).

Reference: /root/reference/src/prover/prover.zig.  The transcript schedule
below is the proof-bytes contract (SURVEY.md §3.2) and is replicated to the
byte:

1.  fresh SHA3 Fiat-Shamir transcript per proof (:91);
2.  bind SHA-256(program), F(entry_pc), F(reg) for each initial reg (:97-110);
3.  run the VM (InvalidInstruction == clean halt; other VM errors propagate,
    :117-148); EmptyTrace if no steps;
4.  witness: 43 MLEs over v = ceil_log2(steps) vars (:156-162);
5.  constraint metadata (:169-175);
6.  sumcheck phase: "SUMCHECK_BEGIN", F(num_steps), F(num_vars); per round
    absorb 4 ZERO coefficients, then squeeze the round challenge into
    final_point (:250-288 — the v1 constraint sumcheck is a structural
    placeholder; final_eval = 0);
7.  Lasso phase: "LASSO_BEGIN"; per traced lookup i: "LASSO_TABLE", F(i),
    then a 0-round degree-2 multiset proof (num_lookups=1 ⇒ num_vars=0, so
    the seeded Xoshiro256++ filler stream is never consumed) (:292-363);
8.  commitments, 4-phase: (1) Merkle-commit all 43 witness MLEs;
    (2) "POLY_COMMITMENTS" + all 43 roots; (3) per poly derive v challenges
    as the opening point, evaluate, Merkle-open at point[0] mod 2^v;
    (4) "OPENING_CLAIMS" + all 43 values — the Jolt PR #981 binding
    (:371-467);
9.  package PublicIO incl. the guest's output tape (:513-559).

TPU acceleration: witness evaluation (43 MLE evals at the challenge points)
and Merkle leaf hashing route through pluggable backends — see
zigz_tpu/ops (device kernels) and zigz_tpu/runtime (native hashing).  The
transcript itself stays on host: it is sequential, cheap, and
consensus-critical.
"""

from __future__ import annotations

import time
from typing import List, Optional

from ..commitments.commit import CommitmentScheme
from ..constraints.builder import ConstraintSystem
from ..constraints.witness import WitnessGenerator
from ..core.hash import FiatShamirTranscript, sha256
from ..core.xoshiro import Xoshiro256
from ..elf import Segment
from ..isa.rv64i import InvalidInstruction
from ..vm.state import VMState
from .proof import CompactLassoList, PipelineLassoProof, Proof, PublicIO

__all__ = ["Prover", "EmptyTrace"]


class EmptyTrace(Exception):
    pass


class Prover:
    """Prover(F) twin (prover.zig:27-561)."""

    def __init__(self, F, seed: int = 0, verbose: bool = False, eval_backend=None,
                 use_native_vm: Optional[bool] = None, protocol_version: int = 1,
                 mesh=None):
        self.F = F
        self.rng = Xoshiro256(seed)
        self.transcript = FiatShamirTranscript()
        self.verbose = verbose
        # Multi-chip: a 1-D jax.sharding.Mesh (axis "trace") shards every
        # hypercube-axis device computation — witness build, Merkle forest,
        # opening evaluations — producing byte-identical proofs
        # (tests/test_parallel.py, __graft_entry__.dryrun_multichip).
        self.mesh = mesh
        # Optional accelerated batch evaluator:
        #   eval_backend(matrix: (43, 2^v) uint64, points: (43, v) uint64) -> (43,) uint64
        self.eval_backend = eval_backend
        # Native (C++) interpreter: auto-detect unless pinned; produces
        # identical traces/proof bytes (tests/test_native_vm.py).
        if use_native_vm is None:
            try:
                from ..runtime import native_vm

                use_native_vm = native_vm.available()
            except Exception:
                use_native_vm = False
        self.use_native_vm = use_native_vm
        # v1 = reference wire parity; v2 = real zerocheck + Lasso (SHA3
        # commitments); v3 = v2 with Poseidon2-over-BabyBear Merkle
        # commitments (the reference's own intended direction,
        # hash.zig:47-49, behind a proof-version bump); v4 = v2 with the
        # 43 witness MLEs under ONE Ligero PCS commitment opened at the
        # zerocheck point, replacing the v1-style Merkle forest +
        # point-to-index openings (the last unbound evals are gone).
        assert protocol_version in (1, 2, 3, 4)
        if protocol_version == 3 and F.MODULUS != 2013265921:
            raise ValueError("protocol_version=3 (Poseidon2 commitments) is BabyBear-only")
        if protocol_version == 4 and F.MODULUS != 2013265921:
            raise ValueError("protocol_version=4 (Ligero witness PCS) is BabyBear-only")
        self.protocol_version = protocol_version
        self.last_timings = {}

    def _hash_mode(self) -> str:
        return "poseidon2" if self.protocol_version == 3 else "sha3"

    def _log(self, msg: str) -> None:
        if self.verbose:
            print(msg)

    def prove(
        self,
        program: bytes,
        entry_pc: int,
        initial_regs: Optional[List[int]] = None,
        max_steps: int = 1 << 20,
        segments: Optional[List[Segment]] = None,
        input_tape: Optional[List[int]] = None,
    ) -> Proof:
        F = self.F
        t0 = time.perf_counter()
        self.last_timings = {}

        # ELF convenience: callers handing raw ELF bytes without segments
        # would otherwise execute the ELF header as instructions and fail
        # with a misleading UnimplementedInstruction.  Deriving segments
        # here matches the CLI (cli.py _load_program); the transcript still
        # binds the full program bytes and the caller's entry_pc.
        if segments is None:
            from .. import elf

            if elf.is_elf(program):
                segments = elf.load(program).segments

        # Fresh transcript per proof (prover.zig:91).
        self.transcript = FiatShamirTranscript()
        transcript = self.transcript

        # Bind public inputs FIRST (prover.zig:97-110).
        program_hash = sha256(program)
        transcript.append_bytes(program_hash)
        transcript.append_field_element(F, F(entry_pc))
        if initial_regs is not None:
            for reg_val in initial_regs:
                transcript.append_field_element(F, F(reg_val))

        # STEP 1: execute (prover.zig:117-148).
        if self.use_native_vm:
            trace, final_state = self._execute_native(
                program, entry_pc, initial_regs, max_steps, segments, input_tape
            )
            lookup_count = trace.num_lookups()
        else:
            vm = self._execute_python(program, entry_pc, initial_regs, max_steps, segments, input_tape)
            trace = vm.trace
            final_state = {
                "final_pc": vm.pc,
                "final_regs": [vm.regs.read(i) for i in range(32)],
                "output_tape": list(vm.output_tape),
            }
            lookup_count = sum(1 for t in trace.lookup_tables if t is not None)

        num_steps = trace.step_count()
        self._log(f"Execution complete: {num_steps} steps")
        if num_steps == 0:
            raise EmptyTrace()
        t1 = time.perf_counter()

        # STEP 2: witness (prover.zig:156-162).  On the v1 device path the
        # host matrix is never needed (commitments, evals, and openings all
        # use the device-built witness), so materialize lazily.
        witness = _LazyWitness(F, trace, mesh=self.mesh)
        num_vars = witness.num_vars
        t2 = time.perf_counter()

        # STEP 3: constraint metadata (prover.zig:169-175).
        constraints = ConstraintSystem()
        constraints.builder.build_all(F, witness)

        # STEP 4+5: constraint sumcheck + lookups — v1 placeholders
        # (prover.zig:250-363) or the v2+ real argument pipeline under the
        # unified commitment harness (prover/unified.py).
        proof = Proof.create(F, num_steps)
        if self.protocol_version >= 2:
            proof.metadata.version = self.protocol_version
            self._generate_v2_unified(proof, witness, trace, program,
                                      entry_pc, segments, initial_regs,
                                      final_state)
        else:
            self._generate_sumcheck_proof(proof, constraints, witness)
            self._generate_lasso_proofs(proof, lookup_count)
        t3 = time.perf_counter()

        # STEP 6: commitments (prover.zig:371-467).  v4 replaces the 43
        # Merkle trees + point-to-index openings with the Ligero witness
        # PCS already emitted in the zerocheck phase.
        if self.protocol_version < 4:
            self._generate_commitments(proof, witness)
        else:
            proof.witness_commitments = []
        t4 = time.perf_counter()

        # STEP 7: public IO (prover.zig:513-559).
        self._package_public_io(proof, program, final_state, entry_pc, initial_regs)

        self.last_timings.update({
            "execute_s": t1 - t0,
            "witness_s": t2 - t1,
            "sumcheck_lasso_s": t3 - t2,
            "commitments_s": t4 - t3,
            "total_s": time.perf_counter() - t0,
            "num_steps": num_steps,
            "num_vars": num_vars,
        })
        return proof

    # ------------------------------------------------------------------
    def _generate_v2_unified(self, proof: Proof, witness, trace, program,
                             entry_pc, segments, initial_regs, final_state) -> None:
        """Protocol v2+ (round 3): the real argument pipeline under the
        unified commitment harness.  Transcript schedule:

          public inputs (prover.zig order) ->
          per-argument public blocks (SUMCHECK_BEGIN / LV / RC / MC / BC)
          -> "V2_DATA" + one mixed Ligero root over EVERY argument's
          challenge-independent columns -> per-argument extension
          challenge draws (nonce retry loops) -> per-argument logUp sums
          -> "V2_ADVICE" + one root over every inverse/multiplicity
          advice column -> per-argument zerochecks -> the batch-eval
          reduction (proofs/batch_eval.py) -> two LigeroMixedClaim
          openings at the reduced point -> "LASSO_BEGIN" + the per-table
          pipeline Lasso sumchecks.

        Replaces the round-2 per-argument commitments (~20 roots and
        openings per proof) with two."""
        from ..constraints.bytecode import BytecodeArgument
        from ..constraints.core_arg import CoreV2Argument
        from ..constraints.memcheck import (
            MemcheckArgument,
            extract_byte_accesses,
            initial_memory_map,
        )
        from ..constraints.regcheck import RegcheckArgument, extract_access_columns
        from ..lookups.pipeline_lasso import (
            extract_table_queries,
            instruction_registers,
            operand_values,
            prove_pipeline_lasso,
            system_read_override,
            write_access_values,
        )
        from ..lookups.validity import ValidityArgument
        from ..prover.unified import prove_unified
        from .proof import V2Section

        F = self.F
        transcript = self.transcript
        num_vars = proof.metadata.num_vars
        t0 = time.perf_counter()

        core = CoreV2Argument(F, witness, trace, self.protocol_version)

        queries = extract_table_queries(trace)
        validity = ValidityArgument(
            F, queries, forge_hook=getattr(self, "_lv_forge_hook", None),
            unsafe_skip_self_checks=getattr(self, "_lv_unsafe", False),
        )

        rs1, rs2, rd = instruction_registers(trace)
        rv1, rv2, _rd_after, _rd_before = operand_values(trace, rs1, rs2, rd)
        wr, ov, wv = write_access_values(trace)
        # SYSTEM steps read (a7, a0) so the syscall dispatch state is a
        # proven column (consumed by the bytecode argument).
        rs1, rs2, rv1, rv2 = system_read_override(trace, rs1, rs2, rv1, rv2)
        access = extract_access_columns(rs1, rs2, wr, rv1, rv2, ov, wv)
        reg = RegcheckArgument(
            F, access, num_vars, initial_regs, final_state["final_regs"],
        )

        init_mem = initial_memory_map(program, entry_pc, segments)
        mc_access = extract_byte_accesses(trace, init_mem)
        mem = MemcheckArgument(
            F, mc_access, init_mem,
            forge_hook=getattr(self, "_mc_forge_hook", None),
            unsafe_skip_self_checks=getattr(self, "_mc_unsafe", False),
        )

        bc = BytecodeArgument(
            F, trace, program, entry_pc, segments, num_vars, reg, core,
            validity, mem, outputs=final_state["output_tape"],
            final_pc=final_state["final_pc"],
            forge_hook=getattr(self, "_bc_forge_hook", None),
            unsafe_skip_self_checks=getattr(self, "_bc_unsafe", False),
        )

        unified = prove_unified(
            F, transcript, [core, validity, reg, mem, bc],
            self._hash_mode(), timings=self.last_timings, mesh=self.mesh,
        )
        self.last_timings["unified_s"] = time.perf_counter() - t0

        # Lasso phase: real per-table sumchecks over the trace's actual
        # operand/result multisets (lookups/pipeline_lasso.py).
        transcript.append_bytes(b"LASSO_BEGIN")
        t0 = time.perf_counter()
        lookup_proofs, extras = prove_pipeline_lasso(
            F, transcript, queries,
            device=self._use_device_commitments(proof.metadata.num_steps),
            mesh=self.mesh,
        )
        proof.lookup_proofs = lookup_proofs
        self.last_timings["lasso_s"] = time.perf_counter() - t0

        proof.v2 = V2Section(
            zerocheck=core.zc,
            column_evals=core.zc.column_evals,
            lasso_extras=extras,
            logup_nonce=core.logup_nonce,
            logup_sum=core.logup_sum,
            lookup_validity=validity.proof,
            regcheck=reg.proof,
            memcheck=mem.proof,
            bytecode=bc.proof,
            witness_evals=core.witness_evals,
            unified=unified,
        )

    def _execute_python(self, program, entry_pc, initial_regs, max_steps, segments, input_tape):
        if segments is not None:
            vm = VMState.init_from_segments(segments, entry_pc, input_tape)
        else:
            vm = VMState.init(program, entry_pc, input_tape)
        if initial_regs is not None:
            for i, value in enumerate(initial_regs):
                if i < 32:
                    vm.regs.write(i, value)
            vm.trace.set_initial_regs(vm.regs.regs)
        step_count = 0
        while not vm.halted and step_count < max_steps:
            try:
                vm.step()
            except InvalidInstruction:
                break
            step_count += 1
        return vm

    def _execute_native(self, program, entry_pc, initial_regs, max_steps, segments, input_tape):
        from ..runtime.native_vm import NativeVM, raise_for_status

        nvm = NativeVM()
        if segments is not None:
            for seg in segments:
                nvm.load_segment(seg.vaddr, seg.data)
        else:
            nvm.load_segment(entry_pc, program)
        result = nvm.run(entry_pc, max_steps, initial_regs, input_tape)
        raise_for_status(result["status"])  # non-halt errors propagate
        return result["trace"], result

    def _generate_sumcheck_proof(self, proof: Proof, constraints, witness) -> None:
        F = self.F
        transcript = self.transcript
        num_vars = witness.num_vars

        transcript.append_bytes(b"SUMCHECK_BEGIN")
        transcript.append_field_element(F, F(witness.num_steps))
        transcript.append_field_element(F, F(num_vars))

        proof.constraint_proof.final_eval = F.zero()
        zero_coeff_bytes = b"\x00" * 8 * 4  # four zero coefficients
        for rnd in range(num_vars):
            for i in range(4):
                proof.constraint_proof.round_polynomials[rnd][i] = F.zero()
            transcript.append_bytes(zero_coeff_bytes)
            proof.constraint_proof.final_point[rnd] = transcript.challenge(F)

    def _generate_lasso_proofs(self, proof: Proof, lookup_count: int) -> None:
        """One filler proof per traced lookup (prover.zig:292-363).

        Every proof is uniform (table_id = i, num_lookups = 1 ⇒ num_vars =
        log2_ceil(1) = 0, so the seeded RNG filler draws nothing), which
        lets us batch the transcript absorption into one update and store
        the proofs compactly.  Byte stream per lookup:
        "LASSO_TABLE" + LE64(table_id mod p)."""
        F = self.F
        transcript = self.transcript
        transcript.append_bytes(b"LASSO_BEGIN")

        if lookup_count > 0:
            import numpy as np

            from ..runtime import native_lasso_id_stream

            stream = native_lasso_id_stream(lookup_count, F.MODULUS)
            if stream is not None:
                # numpy buffers satisfy the buffer protocol — absorb with
                # no intermediate bytes copy.
                transcript._hasher.update(stream)
            else:
                ids = np.arange(lookup_count, dtype=np.uint64)
                if lookup_count > F.MODULUS:
                    # uint64 vector mod is ~2s at 2^22 and a no-op below p.
                    ids %= np.uint64(F.MODULUS)
                stream = np.empty((lookup_count, 19), dtype=np.uint8)
                stream[:, :11] = np.frombuffer(b"LASSO_TABLE", dtype=np.uint8)
                stream[:, 11:] = (
                    np.frombuffer(
                        np.ascontiguousarray(ids, dtype="<u8").tobytes(), dtype=np.uint8
                    ).reshape(lookup_count, 8)
                )
                transcript.append_bytes(stream.tobytes())

        proof.lookup_proofs = CompactLassoList(F, lookup_count)

    def _generate_commitments(self, proof: Proof, witness) -> None:
        if self._use_device_commitments(witness.num_steps):
            from ..commitments.device_forest import DeviceMerkleForest

            t0 = time.perf_counter()
            device_lo = witness.device_lo()
            self.last_timings["witness_dev_s"] = time.perf_counter() - t0
            t0 = time.perf_counter()
            if device_lo is not None:
                forest = DeviceMerkleForest(
                    self.F, lo=device_lo, mesh=self.mesh, hash_mode=self._hash_mode()
                )
            else:
                forest = DeviceMerkleForest(
                    self.F, witness.matrix, mesh=self.mesh, hash_mode=self._hash_mode()
                )
            self.last_timings["forest_s"] = time.perf_counter() - t0
            self._generate_commitments_forest(proof, witness, forest)
            return
        try:
            from ..commitments import host_forest

            native = (
                host_forest.available()
                and self.F.MODULUS < (1 << 32)
                and self._hash_mode() == "sha3"  # the C++ forest is SHA3-only
            )
        except Exception:
            native = False
        if native:
            from ..commitments.host_forest import HostMerkleForest

            self._generate_commitments_forest(
                proof, witness, HostMerkleForest(self.F, witness.matrix)
            )
        else:
            self._generate_commitments_host(proof, witness)

    # Below this many trace steps the host hasher wins: device calls pay
    # per-dispatch tunnel latency that only amortizes on large forests.
    DEVICE_COMMITMENT_MIN_STEPS = 1 << 15

    def _use_device_commitments(self, num_steps: int = None) -> bool:
        import os

        pref = os.environ.get("ZIGZ_TPU_COMMITMENTS", "auto")
        if pref == "host":
            return False
        if pref == "device":
            return True
        if self.mesh is not None:
            # An explicit mesh requests the sharded device pipeline.
            return True
        if num_steps is not None and num_steps < self.DEVICE_COMMITMENT_MIN_STEPS:
            return False
        try:
            import jax

            return jax.default_backend() == "tpu"
        except Exception:
            return False

    def _generate_commitments_host(self, proof: Proof, witness) -> None:
        F = self.F
        transcript = self.transcript
        polynomials = witness.polynomials()  # 43 MLEs in commitment order

        # PHASE 1: Merkle roots for all 43 polynomials (prover.zig:405-410).
        trees = []
        for i, poly in enumerate(polynomials):
            commitment, tree = CommitmentScheme.commit(poly, self._hash_mode())
            trees.append(tree)
            proof.witness_commitments[i].commitment = commitment.commitment

        # PHASE 2: bind all roots (prover.zig:413-416).
        transcript.append_bytes(b"POLY_COMMITMENTS")
        for opening in proof.witness_commitments:
            transcript.append_bytes(opening.commitment)

        # PHASE 3: derive per-poly opening points, evaluate, open
        # (prover.zig:418-447).
        num_vars = witness.num_vars
        for i, poly in enumerate(polynomials):
            point = [transcript.challenge(F) for _ in range(num_vars)]
            opening_proof = CommitmentScheme.open(poly, trees[i], point)
            wc = proof.witness_commitments[i]
            wc.value = opening_proof.value
            wc.proof = opening_proof
            wc.point = opening_proof.point  # alias, as in the reference

        # PHASE 4: bind all opening claims — Jolt PR #981 (prover.zig:463-466).
        transcript.append_bytes(b"OPENING_CLAIMS")
        for opening in proof.witness_commitments:
            transcript.append_field_element(F, opening.value)

    def _generate_commitments_forest(self, proof: Proof, witness, forest) -> None:
        """Forest path (device TPU forest or native host forest): all 43
        Merkle trees built in bulk; only roots + opened sibling paths are
        consumed.  Byte-identical to the per-poly scheme path
        (tests/test_device_forest.py, test_host_forest.py)."""
        import numpy as np

        from ..commitments.commit import OpeningProof as SchemeOpening

        F = self.F
        transcript = self.transcript
        num_vars = witness.num_vars

        # PHASE 1: bulk forest build.
        t0 = time.perf_counter()
        roots = forest.roots()
        self.last_timings["roots_s"] = time.perf_counter() - t0
        for i, root in enumerate(roots):
            proof.witness_commitments[i].commitment = root

        # PHASE 2: bind all roots.
        transcript.append_bytes(b"POLY_COMMITMENTS")
        for root in roots:
            transcript.append_bytes(root)

        # PHASE 3: challenges (sequential, host transcript), evals, openings.
        t0 = time.perf_counter()
        points = [[transcript.challenge(F) for _ in range(num_vars)] for _ in range(43)]
        self.last_timings["points_s"] = time.perf_counter() - t0
        t0 = time.perf_counter()
        if num_vars > 0:
            pts_arr = np.array([[c.value for c in pt] for pt in points], dtype=np.uint64)
            forest_eval = getattr(forest, "eval_backend", None)
            if self.eval_backend is not None:
                values = self.eval_backend(witness.matrix, pts_arr)
            elif forest_eval is not None:
                # The forest evaluates from its device-resident witness —
                # do NOT touch witness.matrix (it would force the lazy
                # host-side materialization just to be ignored).
                values = forest_eval(None, pts_arr)
            else:
                values = self._host_eval_backend(witness.matrix, pts_arr)
        else:
            values = witness.matrix[:, 0]
        self.last_timings["evals_s"] = time.perf_counter() - t0
        indices = np.array(
            [(points[i][0].value % (1 << num_vars)) if num_vars else 0 for i in range(43)],
            dtype=np.int64,
        )
        t0 = time.perf_counter()
        merkle_openings = forest.open_all(indices)
        self.last_timings["opens_s"] = time.perf_counter() - t0
        for i in range(43):
            wc = proof.witness_commitments[i]
            wc.value = F.from_reduced(int(values[i]))
            wc.proof = SchemeOpening(
                point=points[i], value=wc.value, merkle_proof=merkle_openings[i]
            )
            wc.point = wc.proof.point

        # PHASE 4: bind all opening claims.
        transcript.append_bytes(b"OPENING_CLAIMS")
        for opening in proof.witness_commitments:
            transcript.append_field_element(F, opening.value)

    def _host_eval_backend(self, matrix, points):
        """Vectorized host evaluation of B MLEs at B points (LSB folds);
        exact for moduli < 2^31 (products fit uint64)."""
        import numpy as np

        assert self.F.MODULUS < (1 << 31)
        p = np.uint64(self.F.MODULUS)
        cur = np.ascontiguousarray(matrix, dtype=np.uint64)
        for j in range(points.shape[1]):
            r = (points[:, j] % p)[:, None]
            om = (np.uint64(1) + p - r) % p
            cur = (om * cur[:, 0::2] + r * cur[:, 1::2]) % p
        return cur[:, 0]

    def _package_public_io(self, proof: Proof, program: bytes, final_state: dict, entry_pc, initial_regs) -> None:
        outputs = final_state["output_tape"] or None
        proof.public_io = PublicIO(
            program_hash=sha256(program),
            initial_pc=entry_pc,
            initial_regs=list(initial_regs) if initial_regs is not None else None,
            final_pc=final_state["final_pc"],
            final_regs=list(final_state["final_regs"]),
            num_steps=proof.metadata.num_steps,
            initial_memory=None,
            outputs=outputs,
        )


class _LazyWitness:
    """Witness facade: metadata immediately, host matrix on first access,
    optional device-built matrix (ops/witness_dev) for the v1 device path.

    The host and device builders are bit-equal (tests/test_witness_dev.py),
    so whichever materializes first defines the same polynomials."""

    def __init__(self, F, trace, mesh=None):
        from ..constraints.witness import num_vars_for_steps

        self.F = F
        self._trace = trace
        self.mesh = mesh
        self.num_steps = trace.step_count()
        self.num_vars = num_vars_for_steps(self.num_steps)
        self._host = None
        self._device_lo = None

    @property
    def matrix(self):
        return self._host_witness().matrix

    def polynomials(self):
        return self._host_witness().polynomials()

    def _host_witness(self):
        if self._host is None:
            self._host = WitnessGenerator.generate(self.F, self._trace)
        return self._host

    def device_lo(self):
        """(43, 2^v) canonical uint32 device array, or None when the trace
        is not native-columnar or the field is not device-supported.

        Built from compact trace columns even when the host matrix already
        exists (the v2 path materializes it for the constraint arguments):
        rebuilding on device is ~100x cheaper than shipping the host
        matrix through a slow host->device link, and the two builders are
        bit-equal (tests/test_witness_dev.py)."""
        if self._device_lo is None:
            if self.F.MODULUS >= (1 << 32) or not hasattr(self._trace, "columns"):
                return None
            from ..ops.witness_dev import build_witness_device

            self._device_lo = build_witness_device(
                self._trace, self._trace.initial_regs, self.num_vars, mesh=self.mesh
            )
        return self._device_lo
