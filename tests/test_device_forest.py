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


def test_forest_discarded_low_levels(monkeypatch):
    """Force the HBM-bounding discard of wide low levels: opening siblings
    for those levels are recomputed from witness values and must stay
    byte-identical to the host trees (both matrix and device-lo inputs)."""
    from zigz_tpu.commitments import device_forest as df

    monkeypatch.setattr(df, "DISCARD_DIGESTS", 1 << 7)
    monkeypatch.setattr(df, "HOST_TOP_THRESHOLD", 1 << 3)
    B, N = 5, 1 << 6  # leaves level 5*64=320 > 128 -> several discarded levels
    matrix = rng.integers(0, F.MODULUS, size=(B, N), dtype=np.uint64)
    for use_lo in (False, True):
        if use_lo:
            import jax.numpy as jnp

            forest = df.DeviceMerkleForest(F, matrix=None, lo=jnp.asarray(matrix.astype(np.uint32)))
        else:
            forest = df.DeviceMerkleForest(F, matrix)
        assert forest.discarded > 0, "expected discarded levels in this config"
        roots = forest.roots()
        indices = rng.integers(0, N, size=B)
        openings = forest.open_all(indices)
        for i in range(B):
            host = SimpleMerkleTree.build(F, matrix[i])
            assert roots[i] == host.get_root()
            host_open = host.open(int(indices[i]))
            assert openings[i].path.siblings == host_open.path.siblings
            assert openings[i].path.directions == host_open.path.directions
            assert openings[i].value.eql(host_open.value)
            assert SimpleMerkleTree.verify(F, roots[i], openings[i])


def test_forest_grouped_build(monkeypatch):
    """Force the HBM-bounding grouped build (trees built in batches and
    level arrays concatenated): roots and paths must equal the host trees,
    including with discarding active at the same time."""
    from zigz_tpu.commitments import device_forest as df

    monkeypatch.setattr(df, "GROUP_LEAF_DIGESTS", 1 << 7)
    monkeypatch.setattr(df, "DISCARD_DIGESTS", 1 << 8)
    monkeypatch.setattr(df, "HOST_TOP_THRESHOLD", 1 << 3)
    B, N = 7, 1 << 6  # 448 leaf digests -> 4 groups of 2 trees (+1)
    matrix = rng.integers(0, F.MODULUS, size=(B, N), dtype=np.uint64)
    forest = df.DeviceMerkleForest(F, matrix)
    assert forest.discarded > 0
    roots = forest.roots()
    indices = rng.integers(0, N, size=B)
    openings = forest.open_all(indices)
    for i in range(B):
        host = SimpleMerkleTree.build(F, matrix[i])
        assert roots[i] == host.get_root()
        host_open = host.open(int(indices[i]))
        assert openings[i].path.siblings == host_open.path.siblings
        assert openings[i].path.directions == host_open.path.directions
        assert SimpleMerkleTree.verify(F, roots[i], openings[i])
