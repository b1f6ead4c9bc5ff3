"""Pipeline-Lasso (v2) tests: query extraction vs hand-computed operands,
transcript replay, tamper rejection."""

import numpy as np

from zigz_tpu.core.field import BabyBear as F
from zigz_tpu.core.hash import FiatShamirTranscript
from zigz_tpu.guest.asm import Assembler
from zigz_tpu.lookups.pipeline_lasso import (
    TABLE_IDS,
    extract_table_queries,
    hash_query_rows,
    prove_pipeline_lasso,
    verify_pipeline_lasso,
)
from zigz_tpu.runtime.native_vm import NativeVM
from zigz_tpu.vm.state import VMState


def _trace(program, tape=None, native=True):
    if native:
        nvm = NativeVM()
        nvm.load_segment(0x1000, program)
        return nvm.run(0x1000, 1000, None, tape)["trace"]
    vm = VMState.init(program, 0x1000, tape)
    vm.run(1000)
    return vm.trace


def test_extract_op_queries():
    a = Assembler()
    a.li("t0", 7)        # addi -> ADD table, (0, 7) -> 7
    a.li("t1", 5)        # addi -> ADD table
    a.add("t2", "t0", "t1")   # ADD, (7, 5) -> 12
    a.xor("t3", "t0", "t1")   # XOR, (7, 5) -> 2
    a.sub("t4", "t0", "t1")   # SUB, (7, 5) -> 2
    a.ebreak()
    queries = extract_table_queries(_trace(a.assemble()))

    add_in, add_out = queries[TABLE_IDS["ADD"]]
    # Three ADD-table lookups: the two ADDIs + the ADD.
    assert add_in.shape == (3, 2)
    assert list(add_in[2]) == [7, 5] and add_out[2][0] == 12
    assert list(add_in[0]) == [0, 7] and add_out[0][0] == 7

    xor_in, xor_out = queries[TABLE_IDS["XOR"]]
    assert list(xor_in[0]) == [7, 5] and xor_out[0][0] == 2

    sub_in, sub_out = queries[TABLE_IDS["SUB"]]
    assert list(sub_in[0]) == [7, 5] and sub_out[0][0] == 2


def test_extract_mem_and_branch_queries():
    a = Assembler()
    a.li("t0", 0xAB)
    a.li("t1", 0x2000)
    a.sd("t0", "t1", 0)       # STORE (0x2000, 0xAB) -> 0xAB
    a.ld("t2", "t1", 0)       # LOAD  (0x2000, 0xAB) -> 0xAB
    a.beq("t0", "t0", "next") # BEQ taken (jumps over a nop): (0xAB,0xAB) -> 1
    a.nop()
    a.label("next")
    a.beq("t0", "t1", "skip") # BEQ not taken: -> 0
    a.nop()
    a.label("skip")
    a.ebreak()
    queries = extract_table_queries(_trace(a.assemble()))

    st_in, st_out = queries[TABLE_IDS["STORE"]]
    assert list(st_in[0]) == [0x2000, 0xAB] and st_out[0][0] == 0xAB
    ld_in, ld_out = queries[TABLE_IDS["LOAD"]]
    assert list(ld_in[0]) == [0x2000, 0xAB] and ld_out[0][0] == 0xAB
    beq_in, beq_out = queries[TABLE_IDS["BEQ"]]
    assert beq_out[0][0] == 1 and beq_out[1][0] == 0


def test_extraction_native_vs_python_equal():
    a = Assembler()
    a.li("t0", 100)
    a.li("t1", 3)
    a.div("t2", "t0", "t1")
    a.rem("t3", "t0", "t1")
    a.and_("t4", "t0", "t1")
    a.ebreak()
    qn = extract_table_queries(_trace(a.assemble(), native=True))
    qp = extract_table_queries(_trace(a.assemble(), native=False))
    assert set(qn) == set(qp)
    for tid in qn:
        np.testing.assert_array_equal(qn[tid][0], qp[tid][0])
        np.testing.assert_array_equal(qn[tid][1], qp[tid][1])


def test_prove_verify_replay():
    a = Assembler()
    for i in range(10):
        a.addi("t0", "t0", 1)
    a.ebreak()
    queries = extract_table_queries(_trace(a.assemble()))

    t_prove = FiatShamirTranscript()
    proofs, extras = prove_pipeline_lasso(F, t_prove, queries)
    t_verify = FiatShamirTranscript()
    assert verify_pipeline_lasso(F, t_verify, proofs, extras)
    # Transcripts end in the same state (same challenge stream).
    assert t_prove.finalize() == t_verify.finalize()

    # Tampered claimed sum -> reject.
    extras2 = {k: dict(v) for k, v in extras.items()}
    tid = next(iter(extras2))
    extras2[tid]["claimed_sum"] = (extras2[tid]["claimed_sum"] + 1) % F.MODULUS
    assert not verify_pipeline_lasso(F, FiatShamirTranscript(), proofs, extras2)


def test_query_hash_matches_standalone_lasso():
    from zigz_tpu.lookups.lasso import hash_entry_chain

    inputs = np.array([[3, 5]], dtype=np.uint64)
    outputs = np.array([[8]], dtype=np.uint64)
    got = hash_query_rows(F, inputs, outputs)
    assert int(got[0]) == hash_entry_chain(F, [3, 5], [8]).value


def test_device_rounds_bit_equal():
    """Device Lasso round loop must match the host loop exactly, including
    the host-tail handoff, single-device and sharded."""
    import zigz_tpu.lookups.pipeline_lasso as pl
    from zigz_tpu.core.hash import FiatShamirTranscript
    from zigz_tpu.parallel.dist import make_trace_mesh

    rng2 = np.random.default_rng(31)
    evals = rng2.integers(0, F.MODULUS, size=1 << 14, dtype=np.uint64)
    assert len(evals) > pl.HOST_TAIL

    t_host = FiatShamirTranscript()
    host = pl._sumcheck_rounds_host(F, t_host, evals.copy(), None)

    pl._init_device_kernels()
    t_dev = FiatShamirTranscript()
    dev = pl._sumcheck_rounds_device(F, t_dev, evals.copy())

    t_mesh = FiatShamirTranscript()
    mesh = pl._sumcheck_rounds_device(F, t_mesh, evals.copy(), make_trace_mesh(8))

    for other in (dev, mesh):
        assert [[c.value for c in row] for row in host[0]] == [[c.value for c in row] for row in other[0]]
        assert [c.value for c in host[1]] == [c.value for c in other[1]]
        assert host[2].value == other[2].value
    assert t_host.challenge_value(F.MODULUS) == t_dev.challenge_value(F.MODULUS) == t_mesh.challenge_value(F.MODULUS)


def test_v2_classification_m_ext_and_wide_shamt():
    """v2 must not classify M-extension ops or >=32-bit immediate shifts
    into 64-bit ALU tables the results don't satisfy (the reference's
    catalog mapping does: MUL->SUB via the funct7==0 test, SRLI shamt>=33
    -> SRA via funct7's shamt bit).  Regression: honest traces with these
    instructions were rejected by the validity argument."""
    a = Assembler()
    a.li("t0", 7)
    a.li("t1", 6)
    a.mul("t2", "t0", "t1")      # M-ext: no v2 table
    a.mulh("t3", "t0", "t1")     # M-ext: no v2 table
    a.srli("t4", "t0", 33)       # logical, shamt bit 5 set -> SRL
    a.srai("t5", "t0", 40)       # arithmetic -> SRA
    a.ebreak()
    queries = extract_table_queries(_trace(a.assemble()))

    assert TABLE_IDS["SUB"] not in queries       # MUL must not land here
    srl_in, srl_out = queries[TABLE_IDS["SRL"]]
    assert list(srl_in[0]) == [7, 33] and srl_out[0][0] == 7 >> 33
    sra_in, sra_out = queries[TABLE_IDS["SRA"]]
    # SRAI's I-imm carries the funct7 bits (0b0100000 << 5 | shamt); the
    # gadget masks s = in1 & 63, so the raw imm is the query input.
    assert list(sra_in[0]) == [7, 1024 + 40] and sra_out[0][0] == 7 >> 40

    # End-to-end: v2 prove+verify of the same program accepts.
    from zigz_tpu.prover.prover import Prover
    from zigz_tpu.verifier.verifier import Verifier

    proof = Prover(F, seed=0, protocol_version=2).prove(
        a.assemble(), 0x1000, None, 1000, None, None
    )
    assert Verifier(F).verify(proof, a.assemble()) == "Accept"
