"""Poseidon2-over-BabyBear tests: permutation properties, numpy/host
equivalence, hasher interface."""

import numpy as np

from zigz_tpu.core.field import BabyBear as F
from zigz_tpu.core import poseidon2 as p2

rng = np.random.default_rng(3)


def test_permutation_deterministic_and_nontrivial():
    state = list(range(p2.T))
    out1 = p2.permute(state)
    out2 = p2.permute(state)
    assert out1 == out2
    assert out1 != state
    assert all(0 <= x < p2.P for x in out1)


def test_permutation_bijective_on_samples():
    # Distinct inputs must map to distinct outputs (necessary condition).
    seen = set()
    for i in range(50):
        out = tuple(p2.permute([i] + [0] * (p2.T - 1)))
        assert out not in seen
        seen.add(out)


def test_np_permute_matches_scalar():
    states = rng.integers(0, p2.P, size=(p2.T, 8), dtype=np.uint64)
    vec = p2.np_permute(states.copy())
    for n in range(8):
        scalar = p2.permute([int(states[i, n]) for i in range(p2.T)])
        assert [int(vec[i, n]) for i in range(p2.T)] == scalar


def test_sponge_basic_properties():
    d1 = p2.hash_field_values([1, 2, 3])
    assert len(d1) == 32
    assert d1 == p2.hash_field_values([1, 2, 3])
    assert d1 != p2.hash_field_values([1, 2, 4])
    # Length domain separation: [1,2,3] vs [1,2,3,0] differ.
    assert d1 != p2.hash_field_values([1, 2, 3, 0])


def test_hasher_interface():
    el = F(42)
    leaf = p2.Poseidon2Hasher.hash_leaf(F, el)
    assert leaf == p2.Poseidon2Hasher.hash_leaf_value(42)
    node = p2.Poseidon2Hasher.hash_internal(leaf, leaf)
    assert len(node) == 32
    assert node != p2.Poseidon2Hasher.hash_internal(leaf, p2.Poseidon2Hasher.hash_leaf_value(43))
    # Order matters.
    a, b = p2.Poseidon2Hasher.hash_leaf_value(1), p2.Poseidon2Hasher.hash_leaf_value(2)
    assert p2.Poseidon2Hasher.hash_internal(a, b) != p2.Poseidon2Hasher.hash_internal(b, a)


def test_differs_from_sha3():
    from zigz_tpu.core.hash import SHA3Hasher

    assert p2.Poseidon2Hasher.hash_leaf_value(123) != SHA3Hasher.hash_leaf_value(123)


def test_merkle_tree_with_poseidon2():
    """A Merkle tree over the Poseidon2 hasher (the MerkleTreePoseidon2
    alias surface of the reference, merkle_tree.zig:414-416)."""
    from zigz_tpu.commitments.merkle import MerklePath, OpeningProof

    values = [F(v) for v in range(8)]
    level = [p2.Poseidon2Hasher.hash_leaf(F, v) for v in values]
    while len(level) > 1:
        level = [
            p2.Poseidon2Hasher.hash_internal(level[i], level[i + 1])
            for i in range(0, len(level), 2)
        ]
    root = level[0]
    assert len(root) == 32


# -- device kernel parity ---------------------------------------------------

def test_device_kernel_matches_host():
    """Leaves + merges + full tree in ONE test: every jit shape compiled
    here is reused down the tree chain (XLA CPU compiles of the permutation
    cost ~10s per shape, so the parity checks share one 16-leaf chain)."""
    from zigz_tpu.ops import poseidon2 as p2d

    vals = rng.integers(0, p2.P, size=16, dtype=np.uint64)
    level = p2d.p2_leaves(vals)
    digests = p2d.limbs_to_bytes(level)
    for i, v in enumerate(vals):
        assert digests[i * 32 : (i + 1) * 32] == p2.hash_field_values([int(v)]), i

    host_level = [p2.Poseidon2Hasher.hash_leaf_value(int(v)) for v in vals]
    while level.shape[-1] > 1:
        level = p2d.p2_merge(level)
        host_level = [
            p2.Poseidon2Hasher.hash_internal(host_level[i], host_level[i + 1])
            for i in range(0, len(host_level), 2)
        ]
        got = p2d.limbs_to_bytes(level)
        for i in range(len(host_level)):
            assert got[i * 32 : (i + 1) * 32] == host_level[i], (level.shape, i)
