"""Device Merkle forest parity vs host trees."""

import numpy as np

import zigz_tpu  # installs native backend
from zigz_tpu.commitments.device_forest import DeviceMerkleForest
from zigz_tpu.commitments.merkle import SimpleMerkleTree
from zigz_tpu.core.field import BabyBear as F

rng = np.random.default_rng(5)


def test_forest_roots_and_paths_match_host():
    B, N = 7, 64
    matrix = rng.integers(0, F.MODULUS, size=(B, N), dtype=np.uint64)
    forest = DeviceMerkleForest(F, matrix)
    roots = forest.roots()
    indices = rng.integers(0, N, size=B)
    openings = forest.open_all(indices)

    for i in range(B):
        host = SimpleMerkleTree.build(F, matrix[i])
        assert roots[i] == host.get_root()
        host_open = host.open(int(indices[i]))
        assert openings[i].index == host_open.index
        assert openings[i].value.eql(host_open.value)
        assert openings[i].path.siblings == host_open.path.siblings
        assert openings[i].path.directions == host_open.path.directions
        assert SimpleMerkleTree.verify(F, roots[i], openings[i])


def test_forest_single_leaf():
    matrix = rng.integers(0, F.MODULUS, size=(3, 1), dtype=np.uint64)
    forest = DeviceMerkleForest(F, matrix)
    for i in range(3):
        host = SimpleMerkleTree.build(F, matrix[i])
        assert forest.roots()[i] == host.get_root()
    openings = forest.open_all(np.zeros(3, dtype=np.int64))
    assert openings[0].path.siblings == []


def test_forest_host_top_hybrid():
    """Cross the HOST_TOP_THRESHOLD so some levels fold on the host hasher;
    roots and paths must still match per-tree host trees exactly."""
    from zigz_tpu.commitments import device_forest as df

    B, N = 5, 1 << 13  # 40960 leaf digests > HOST_TOP_THRESHOLD (2^14)
    matrix = rng.integers(0, F.MODULUS, size=(B, N), dtype=np.uint64)
    forest = DeviceMerkleForest(F, matrix)
    assert forest.host_levels, "expected host-side top levels in this config"
    roots = forest.roots()
    indices = rng.integers(0, N, size=B)
    openings = forest.open_all(indices)
    for i in range(B):
        tree = SimpleMerkleTree.build(F, matrix[i])
        assert roots[i] == tree.get_root()
        host_open = tree.open(int(indices[i]))
        assert openings[i].path.siblings == host_open.path.siblings
        assert SimpleMerkleTree.verify(F, roots[i], openings[i])
