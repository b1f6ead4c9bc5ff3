"""Device-resident Merkle forest: all 43 witness trees built on TPU.

The commitment phase hashes 43 * 2^(v+1) small messages — at 2^20 steps
that is ~90M SHA3 permutations, the prover's dominant cost on CPU.  Here
the whole forest lives on device (Pallas Keccak kernels, ops/keccak) and
only the 43 roots plus the 43*v opened sibling digests cross back to host.

Structure note for the axon TPU backend: every eager device op pays a
multi-second compile on first use, so the ENTIRE forest build (leaf
digests + every merge level + the glue between them) is ONE jitted
function per witness shape, and the opening-path gather is one more.
Compiles are cached persistently; realistic witness sizes are the powers
of two 2^10..2^22, each compiled once per machine.

Byte-identical roots and authentication paths vs the host SimpleMerkleTree
(tests/test_device_forest.py).
"""

from __future__ import annotations

from functools import partial
from typing import List

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import keccak
from .merkle import MerklePath, OpeningProof

__all__ = ["DeviceMerkleForest"]


def _build_forest_lo(lo, num_trees: int):
    """flat (B*N,) low leaf words (high words all zero) -> tuple of level
    digest arrays; level k has B * N/2^k digests (tree-major layout, pairs
    never cross trees).

    Structure: a HOST loop dispatching per-level jitted kernels.  A single
    whole-forest jit traces thousands of pallas calls into one graph and
    XLA compile time explodes (>10 min at 2^20); per-level graphs are
    bounded (the pallas executables and glue are shape-cached, ~25
    distinct shapes across all witness sizes, persisted on disk)."""
    level = keccak.sha3_leaves_device(lo, jnp.zeros_like(lo))
    levels = [level]
    while level.shape[-1] > max(num_trees, HOST_TOP_THRESHOLD):
        level = keccak.sha3_merge(level)
        levels.append(level)
    return tuple(levels)


# Below this many digests a merge level is finished on the host hasher:
# each device launch costs ~15ms of tunnel latency while the C++ backend
# folds 16k hashes in ~3ms.
HOST_TOP_THRESHOLD = 1 << 14


@jax.jit
def _gather_levels(levels, flat_indices):
    """Per-level sibling gather: levels[k][:, flat_indices[k]] stacked as
    (num_levels, 8, B)."""
    return jnp.stack([lvl[:, idx] for lvl, idx in zip(levels, flat_indices)])


class DeviceMerkleForest:
    def __init__(self, F, matrix: np.ndarray = None, lo=None):
        """Either ``matrix`` ((B, N) canonical uint64 on host) or ``lo``
        ((B, N) canonical uint32 already on device, e.g. from
        ops/witness_dev.build_witness_device)."""
        assert F.MODULUS < (1 << 32)
        self.F = F
        self.matrix = matrix
        if lo is None:
            # Witness values are canonical (< p < 2^31), so the high
            # message word is always zero — ship only the low words
            # (halves the host->device transfer).
            lo = jnp.asarray(matrix.astype(np.uint32))
        self.lo = lo
        B, N = lo.shape
        self.B, self.N = B, N
        self.height = N.bit_length() - 1
        self.levels = _build_forest_lo(self.lo.reshape(-1), B)
        # Host top: transfer the smallest device level once and fold the
        # remaining levels with the native hasher (tree-major pairs stay
        # within trees while the per-tree width is even).
        from .merkle import batch_merge_hashes

        self.host_levels = []
        top = keccak.digests_to_bytes(self.levels[-1])
        while len(top) // 32 > B:
            top = batch_merge_hashes(top)
            self.host_levels.append(top)

    # -- device evaluation (reuses the transferred witness) ----------------
    def eval_backend(self, matrix: np.ndarray, points: np.ndarray) -> np.ndarray:
        """Batched MLE evaluation at per-row points on device — the witness
        already lives on device as ``self.lo``, so only the (B, v) points
        transfer.  Canonical uint64 in/out (drop-in for the host backend)."""
        from ..ops import babybear as bb
        from ..ops import mle as mle_ops

        matrix_m = bb.to_mont(self.lo)
        points_m = jnp.asarray(bb.np_to_mont(points.astype(np.uint64)))
        result_m = mle_ops.batch_eval_lsb(matrix_m, points_m)
        return np.asarray(bb.from_mont(result_m), dtype=np.uint64)

    # -- queries -----------------------------------------------------------
    def roots(self) -> List[bytes]:
        root_bytes = (
            self.host_levels[-1]
            if self.host_levels
            else keccak.digests_to_bytes(self.levels[-1])
        )
        return [root_bytes[i * 32 : (i + 1) * 32] for i in range(self.B)]

    def open_all(self, indices: np.ndarray) -> List[OpeningProof]:
        """One opening per tree at the given per-tree leaf indices; sibling
        digests for every (tree, level) gathered in a single device call."""
        B, N = self.B, self.N
        indices = np.asarray(indices, dtype=np.int64)
        assert indices.shape == (B,)

        # Host-side index math (cheap, no device compiles).
        num_device_levels = len(self.levels)
        tree_base = np.arange(B, dtype=np.int64)
        cur = indices.copy()
        n = N
        flat_indices = []
        direction_rows = []
        host_sibling_rows = []  # per host level: list of B digests
        for level in range(self.height):
            is_right = (cur % 2) == 1
            sibling_local = np.where(is_right, cur - 1, cur + 1)
            if level < num_device_levels:
                flat_indices.append(jnp.asarray(tree_base * n + sibling_local))
            else:
                blob = self.host_levels[level - num_device_levels]
                host_sibling_rows.append(
                    [
                        blob[(tree_base[i] * n + sibling_local[i]) * 32 :][:32]
                        for i in range(B)
                    ]
                )
            direction_rows.append(is_right.copy())
            cur //= 2
            n //= 2

        gather_count = min(self.height, num_device_levels)
        if gather_count > 0:
            gathered = np.asarray(
                _gather_levels(tuple(self.levels[:gather_count]), tuple(flat_indices))
            )  # (gather_count, 8, B)
        else:
            gathered = np.zeros((0, 8, B), dtype=np.uint32)

        if self.matrix is not None:
            leaf_values = [int(self.matrix[i, indices[i]]) for i in range(B)]
        else:
            # Device-resident witness: gather the 43 opened leaf values.
            flat = jnp.asarray(np.arange(B) * N + indices)
            leaf_values = [int(v) for v in np.asarray(self.lo.reshape(-1)[flat])]

        out = []
        for i in range(B):
            siblings = []
            for level in range(self.height):
                if level < num_device_levels:
                    words = gathered[level, :, i].astype("<u4")
                    siblings.append(words.tobytes())
                else:
                    siblings.append(host_sibling_rows[level - num_device_levels][i])
            out.append(
                OpeningProof(
                    index=int(indices[i]),
                    value=self.F.from_reduced(leaf_values[i]),
                    path=MerklePath(
                        siblings=siblings,
                        directions=[bool(direction_rows[level][i]) for level in range(self.height)],
                    ),
                )
            )
        return out
