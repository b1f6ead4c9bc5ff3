"""Native host forest parity vs per-tree SimpleMerkleTree."""

import numpy as np
import pytest

import zigz_tpu
from zigz_tpu.commitments import host_forest
from zigz_tpu.commitments.merkle import SimpleMerkleTree
from zigz_tpu.core.field import BabyBear as F

pytestmark = pytest.mark.skipif(not host_forest.available(), reason="no native forest")

rng = np.random.default_rng(21)


def test_forest_matches_per_tree():
    B, N = 9, 128
    matrix = rng.integers(0, F.MODULUS, size=(B, N), dtype=np.uint64)
    forest = host_forest.HostMerkleForest(F, matrix)
    roots = forest.roots()
    indices = rng.integers(0, N, size=B)
    openings = forest.open_all(indices)
    for i in range(B):
        tree = SimpleMerkleTree.build(F, matrix[i])
        assert roots[i] == tree.get_root()
        ho = tree.open(int(indices[i]))
        assert openings[i].path.siblings == ho.path.siblings
        assert openings[i].path.directions == ho.path.directions
        assert openings[i].value.eql(ho.value)
        assert SimpleMerkleTree.verify(F, roots[i], openings[i])


def test_forest_single_leaf():
    matrix = rng.integers(0, F.MODULUS, size=(4, 1), dtype=np.uint64)
    forest = host_forest.HostMerkleForest(F, matrix)
    for i in range(4):
        assert forest.roots()[i] == SimpleMerkleTree.build(F, matrix[i]).get_root()


def test_prover_forest_vs_scheme_bytes():
    """Proof bytes identical whether commitments go through the native
    forest or the per-poly scheme path."""
    import os

    from zigz_tpu.prover.prover import Prover
    from zigz_tpu.prover.serialization import BinarySerializer

    program = bytes([0x13, 0x00, 0x00, 0x00] * 64)
    ser = BinarySerializer(F)
    p_forest = Prover(F, seed=0).prove(program, 0x1000, None, 1 << 10, None, None)

    # Force the fallback per-poly path by monkeypatching availability.
    orig = host_forest.available
    host_forest.available = lambda: False
    try:
        p_scheme = Prover(F, seed=0).prove(program, 0x1000, None, 1 << 10, None, None)
    finally:
        host_forest.available = orig
    assert ser.serialize(p_forest) == ser.serialize(p_scheme)
