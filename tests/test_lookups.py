"""Lasso lookup-argument tests (ports of the colocated tests in
lasso_prover.zig / lasso_verifier.zig / table_builder.zig /
table_decomposition.zig)."""

import numpy as np
import pytest
import xxhash

from zigz_tpu.core.field import BabyBear, Field
from zigz_tpu.lookups.lasso import (
    LassoProver,
    LassoVerifier,
    LookupQuery,
    hash_entry_chain,
)
from zigz_tpu.lookups.table_builder import (
    build_add_table,
    build_and_table,
    build_sparse_conditional_table,
    build_xor_table,
)
from zigz_tpu.lookups.table_decomposition import (
    DecomposedTable,
    DecompositionAnalysis,
    DecompositionStrategy,
    add16_carry_procedural,
    build_xor8_subtable,
    chunk_u32_8bit,
    chunk_u32_16bit,
    unchunk_u32_8bit,
    unchunk_u32_16bit,
)

F = Field(17)
BB = BabyBear


def test_build_add_table():
    t = build_add_table(BB, 2)  # 2-bit: 16 entries
    assert len(t) == 16
    # (3 + 2) mod 4 = 1
    out = t.lookup([BB(3), BB(2)])
    assert out is not None and out[0].value == 1


def test_build_xor_and_tables():
    tx = build_xor_table(BB, 3)
    assert tx.lookup([BB(5), BB(3)])[0].value == 6
    ta = build_and_table(BB, 3)
    assert ta.lookup([BB(5), BB(3)])[0].value == 1


def test_sparse_conditional_table():
    t = build_sparse_conditional_table(BB)
    key = (7 << 8) | 7
    entry = t.lookup(key)
    assert entry is not None and entry.outputs[0].value == 1
    assert t.lookup((7 << 8) | 8) is None


def test_chunk_codecs():
    v = 0x12345678
    assert unchunk_u32_16bit(chunk_u32_16bit(v)) == v
    assert unchunk_u32_8bit(chunk_u32_8bit(v)) == v
    assert chunk_u32_16bit(v) == [0x5678, 0x1234]
    assert chunk_u32_8bit(v) == [0x78, 0x56, 0x34, 0x12]


def test_xor8_subtable():
    sub = build_xor8_subtable(BB)
    assert len(sub.entries) == 65536
    assert sub.entries.lookup([BB(0xAA), BB(0x55)])[0].value == 0xFF


def test_add16_carry_procedural_matches_naive():
    sub = add16_carry_procedural()
    assert sub.size == 1 << 33  # the reference's infeasible naive table
    # Spot-check ranges against the reference enumeration order
    # (a outer, b middle, carry inner).
    inputs, outputs = sub.eval_range(0, 8)
    # idx 0..7: a=0, b=0..3, carry=0/1
    np.testing.assert_array_equal(inputs[:, 0], 0)
    np.testing.assert_array_equal(inputs[:, 1], [0, 0, 1, 1, 2, 2, 3, 3])
    np.testing.assert_array_equal(inputs[:, 2], [0, 1] * 4)
    np.testing.assert_array_equal(outputs[:, 0], [0, 1, 1, 2, 2, 3, 3, 4])
    # Carry propagation: a=0xFFFF, b=0xFFFF, cin=1 -> sum 0xFFFF, cout 1
    idx = (0xFFFF << 17) | (0xFFFF << 1) | 1
    inp, out = sub.eval_range(idx, idx + 1)
    assert out[0, 0] == 0xFFFF and out[0, 1] == 1


def test_decomposition_analysis():
    a = DecompositionAnalysis.analyze(32, DecompositionStrategy.Chunk8)
    assert a.decomposed_size == 1 << 16
    assert a.space_savings_factor > 1e10
    d = DecomposedTable.create_xor32_chunk8(BB)
    assert d.memory_usage() == 65536 * 3 * 8
    d2 = DecomposedTable.create_add32_chunk16()
    assert d2.memory_usage() == 0  # procedural: zero storage


def test_hash_entry_chain_exact_xxh3():
    # Pin the exact chain: h ^= v; h = xxh3_64(le64(h), seed=0).
    h = 0
    for v in (3, 2, 1):
        h ^= v
        h = xxhash.xxh3_64_intdigest(h.to_bytes(8, "little"), seed=0)
    expected = h % BB.MODULUS
    got = hash_entry_chain(BB, [3, 2], [1])
    assert got.value == expected


def _identity_queries(table, indices):
    return [
        LookupQuery(inputs=table.entry(i).inputs, expected_outputs=table.entry(i).outputs)
        for i in indices
    ]


def test_lasso_prove_verify_rounds():
    table = build_add_table(BB, 2)
    queries = _identity_queries(table, [0, 5, 10, 15])
    proof = LassoProver.prove(BB, table, queries)
    assert proof.num_lookups == 4
    assert proof.sumcheck_proof.num_vars == 2
    # Table-commitment binding: verify vs the same table recomputes and
    # matches; a different table rejects.
    other = build_xor_table(BB, 2)
    res = LassoVerifier.verify(BB, proof, other, 4)
    assert not res.is_valid and "Table commitment" in res.reason


def test_lasso_prove_with_mapping_validation():
    table = build_add_table(BB, 2)
    queries = _identity_queries(table, [3, 7])
    proof = LassoProver.prove_with_mapping(BB, table, queries, [3, 7])
    assert proof.num_lookups == 2
    # Wrong mapping -> QueryTableMismatch.
    with pytest.raises(ValueError, match="QueryTableMismatch"):
        LassoProver.prove_with_mapping(BB, table, queries, [3, 8])
    with pytest.raises(ValueError, match="MappingLengthMismatch"):
        LassoProver.prove_with_mapping(BB, table, queries, [3])


def test_lasso_verify_fast():
    table = build_add_table(BB, 2)
    queries = _identity_queries(table, [0, 1])
    proof = LassoProver.prove(BB, table, queries)
    ok = LassoVerifier.verify_fast(
        BB, proof, proof.table_commitment, 2, proof.sumcheck_proof.final_eval
    )
    assert ok.is_valid
    bad = LassoVerifier.verify_fast(BB, proof, b"\x00" * 32, 2, proof.sumcheck_proof.final_eval)
    assert not bad.is_valid
    wrong_n = LassoVerifier.verify_fast(
        BB, proof, proof.table_commitment, 3, proof.sumcheck_proof.final_eval
    )
    assert not wrong_n.is_valid


def test_lasso_num_lookups_mismatch():
    table = build_add_table(BB, 2)
    queries = _identity_queries(table, [0, 1, 2])
    proof = LassoProver.prove(BB, table, queries)
    res = LassoVerifier.verify(BB, proof, table, 5)
    assert not res.is_valid and "lookups mismatch" in res.reason


def test_lasso_sumcheck_rounds_internally_consistent():
    table = build_add_table(BB, 3)
    queries = _identity_queries(table, list(range(8)))
    proof = LassoProver.prove(BB, table, queries)
    from zigz_tpu.proofs.sumcheck import SumcheckVerifier

    ok, final_claim = SumcheckVerifier.verify_rounds(
        BB, proof.sumcheck_proof, proof.sumcheck_proof.final_eval
    )
    # Rounds verify against final_eval as the claim only when the fold of the
    # query poly equals its own hypercube sum... in general the claim is the
    # hypercube sum; check with the true sum:
    # (the reference passes final_eval as claimed_sum in its verifier)
    ok2, fc2 = SumcheckVerifier.verify_rounds(
        BB, proof.sumcheck_proof, _query_sum(BB, table, queries)
    )
    assert ok2
    assert fc2.eql(proof.sumcheck_proof.final_eval)


def _query_sum(F, table, queries):
    total = F.zero()
    for q in queries:
        total = total.add(hash_entry_chain(F, q.input_values(), q.output_values()))
    return total
