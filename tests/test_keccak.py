"""Device Keccak bit-exactness vs hashlib."""

import hashlib

import numpy as np

from zigz_tpu.ops import keccak

rng = np.random.default_rng(99)


def test_sha3_leaves_matches_hashlib():
    vals = rng.integers(0, 1 << 63, size=300, dtype=np.uint64)
    vals[0], vals[1] = 0, (1 << 64) - 1
    digests = keccak.digests_to_bytes(keccak.sha3_leaves(vals))
    for i, v in enumerate(vals):
        expected = hashlib.sha3_256(int(v).to_bytes(8, "little")).digest()
        assert digests[i * 32 : (i + 1) * 32] == expected, i


def test_sha3_merge_matches_hashlib():
    vals = rng.integers(0, 1 << 63, size=64, dtype=np.uint64)
    leaf_digests = keccak.sha3_leaves(vals)
    parents = keccak.digests_to_bytes(keccak.sha3_merge(leaf_digests))
    leaf_bytes = keccak.digests_to_bytes(leaf_digests)
    for i in range(32):
        expected = hashlib.sha3_256(leaf_bytes[i * 64 : (i + 1) * 64]).digest()
        assert parents[i * 32 : (i + 1) * 32] == expected, i


def test_full_tree_matches_host_merkle():
    import zigz_tpu  # installs native backend
    from zigz_tpu.commitments.merkle import SimpleMerkleTree
    from zigz_tpu.core.field import BabyBear as F

    vals = rng.integers(0, F.MODULUS, size=256, dtype=np.uint64)
    host_tree = SimpleMerkleTree.build(F, vals)

    level = keccak.sha3_leaves(vals)
    while level.shape[-1] > 1:
        level = keccak.sha3_merge(level)
    root = keccak.digests_to_bytes(level)
    assert root == host_tree.get_root()


def test_chunk_boundary():
    # Exercise the padded-tail path with n just over a chunk... use a small
    # chunk by monkeypatching for test speed.
    old = keccak.CHUNK
    keccak.CHUNK = 64
    try:
        vals = rng.integers(0, 1 << 63, size=100, dtype=np.uint64)
        digests = keccak.digests_to_bytes(keccak.sha3_leaves(vals))
        for i in (0, 63, 64, 99):
            expected = hashlib.sha3_256(int(vals[i]).to_bytes(8, "little")).digest()
            assert digests[i * 32 : (i + 1) * 32] == expected, i
    finally:
        keccak.CHUNK = old
