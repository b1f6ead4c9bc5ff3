"""Device-resident Merkle forest: all 43 witness trees built on TPU.

The commitment phase hashes 43 * 2^(v+1) small messages — at 2^20 steps
that is ~90M SHA3 permutations, the prover's dominant cost on CPU.  Here
the whole forest lives on device: leaf digests via ops.keccak.sha3_leaves,
each level via sha3_merge (trees batched together — pairs never cross tree
boundaries because every tree's level length is a power of two), and only
the 43 roots plus the 43*v opened sibling digests ever cross back to host.

Produces byte-identical roots and authentication paths to the host
SimpleMerkleTree (tests/test_device_forest.py).
"""

from __future__ import annotations

from typing import List

import jax
import numpy as np

from ..ops import keccak
from .merkle import MerklePath, OpeningProof

__all__ = ["DeviceMerkleForest"]


class DeviceMerkleForest:
    def __init__(self, F, matrix: np.ndarray):
        """matrix: (B, N) canonical uint64, N a power of two."""
        self.F = F
        self.matrix = matrix
        B, N = matrix.shape
        self.B, self.N = B, N
        self.height = N.bit_length() - 1

        flat = np.ascontiguousarray(matrix.reshape(-1), dtype=np.uint64)
        level = keccak.sha3_leaves(flat)  # (8, B*N)
        self.levels = [level]
        n = N
        while n > 1:
            level = keccak.sha3_merge(level)  # halves within each tree
            self.levels.append(level)
            n //= 2
        jax.block_until_ready(self.levels[-1])

    # -- queries -----------------------------------------------------------
    def roots(self) -> List[bytes]:
        root_bytes = keccak.digests_to_bytes(self.levels[-1])  # B digests
        return [root_bytes[i * 32 : (i + 1) * 32] for i in range(self.B)]

    def open_all(self, indices: np.ndarray) -> List[OpeningProof]:
        """One opening per tree at the given per-tree leaf indices; all
        sibling digests are gathered level-parallel across the forest."""
        B, N = self.B, self.N
        indices = np.asarray(indices, dtype=np.int64)
        assert indices.shape == (B,)

        sibling_bytes: List[List[bytes]] = [[] for _ in range(B)]
        directions: List[List[bool]] = [[] for _ in range(B)]
        cur = indices.copy()
        tree_base = np.arange(B, dtype=np.int64)
        n = N
        for level in range(self.height):
            is_right = (cur % 2) == 1
            sibling_local = np.where(is_right, cur - 1, cur + 1)
            flat_idx = tree_base * n + sibling_local
            gathered = np.asarray(self.levels[level][:, flat_idx])  # (8, B)
            blob = keccak.digests_to_bytes(gathered)
            for i in range(B):
                sibling_bytes[i].append(blob[i * 32 : (i + 1) * 32])
                directions[i].append(bool(is_right[i]))
            cur //= 2
            n //= 2

        out = []
        for i in range(B):
            out.append(
                OpeningProof(
                    index=int(indices[i]),
                    value=self.F.from_reduced(int(self.matrix[i, indices[i]])),
                    path=MerklePath(siblings=sibling_bytes[i], directions=directions[i]),
                )
            )
        return out
