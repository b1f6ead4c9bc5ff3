"""Mesh-sharded mixed Ligero commitments (SPMD over the matrix axes).

Round-5 close of the long-open SURVEY §2.11 rows 3-4 gap: the v2 unified
commitment pipeline (prover/unified.py) ran its DATA/ADVICE commits
replicated under a mesh while the zerochecks and pipeline-Lasso sharded.
This module shards the commit itself with explicit collectives:

* the (rows, n) input matrix is placed ROW-sharded over the 1-D "trace"
  mesh axis (``jax.sharding.NamedSharding``);
* each device Reed-Solomon-encodes its own rows (ops/ntt_dev four-step
  NTT — rows are independent, so the encode is collective-free);
* ONE ``all_to_all`` re-shards the encoded matrix from row-sharded to
  COLUMN-sharded (the only data movement of the commit);
* each device runs the multi-block SHA3-256 column sponge over its
  column slice (ops/keccak jnp Keccak-f[1600] on u32 lane pairs — the
  same permutation the v1 Merkle forest shards with);
* the per-column digests ride back replicated (out_specs gathers the
  column axis), and the Merkle levels build on host as usual.

Openings re-encode shard-locally and gather only the ``t`` opened
columns (collective-free until the final gather of a (rows, t) slice).

Exactness: the NTT and the sponge are the same mod-p / bitwise programs
as the host path, so the digest blob — and therefore the root, the
transcript, and the proof bytes — are byte-identical to
``commitments.ligero._hash_columns(ntt_pow2_u32(mat, n_e), "sha3")``
(tests/test_ligero_mesh.py).  The reference has no distribution at all
(SURVEY §2.11); the anchor being parallelized is the commitment build of
prover.zig:281-286's "complete implementation".
"""

from __future__ import annotations

from typing import Dict

import numpy as np

__all__ = ["mesh_commit_ok", "commit_columns_mesh", "MeshEncoded"]

_RATE_WORDS = 34  # 136-byte SHA3-256 rate as u32 words


def _pad_words(rows: int) -> int:
    return ((rows * 4) // 136 + 1) * _RATE_WORDS


def mesh_commit_ok(mesh, n_e: int, total_rows: int) -> bool:
    """The sharded path needs the encoded-column axis divisible by the
    mesh (for the all_to_all) and a device-NTT-sized code length."""
    if mesh is None:
        return False
    d = int(np.prod(mesh.devices.shape))
    return d > 1 and n_e >= 256 and n_e % d == 0 and total_rows >= 1


def _sponge_columns(enc, rows: int, pw: int):
    """SHA3-256 of every column of ``enc`` (rows_pad, n_loc) — absorbing
    the first ``rows`` words as 4-byte LE values plus standard padding.
    Returns (8, n_loc) digest words (lo0,hi0,..,lo3,hi3)."""
    import jax
    import jax.numpy as jnp

    from .keccak import _round_body

    n_loc = enc.shape[1]
    msg = jnp.zeros((pw, n_loc), jnp.uint32)
    msg = msg.at[:rows].set(enc[:rows])
    msg = msg.at[rows].set(jnp.uint32(0x06))
    # 0x80 in the final byte of the last block; never collides with the
    # 0x06 byte in-word (byte 0 vs byte 3), so add == xor.
    msg = msg.at[pw - 1].add(jnp.uint32(0x80000000))

    def absorb(b, st):
        slo, shi = st
        blk = jax.lax.dynamic_slice_in_dim(msg, b * _RATE_WORDS, _RATE_WORDS, 0)
        slo = slo.at[:17].set(slo[:17] ^ blk[0::2])
        shi = shi.at[:17].set(shi[:17] ^ blk[1::2])
        return jax.lax.fori_loop(0, 24, _round_body, (slo, shi))

    # Derive the zero state from msg so it inherits msg's varying manual
    # axes under shard_map (a literal jnp.zeros would be "unvarying" and
    # reject as the fori_loop carry).
    zeros = jnp.zeros_like(msg[:25])
    slo, shi = jax.lax.fori_loop(0, pw // _RATE_WORDS, absorb, (zeros, zeros))
    return jnp.stack([slo[0], shi[0], slo[1], shi[1],
                      slo[2], shi[2], slo[3], shi[3]])


_COMMIT_FNS: Dict[tuple, object] = {}
_GATHER_FNS: Dict[tuple, object] = {}


def _shard_rows(mesh, mat_u32: np.ndarray):
    """Row-shard a host matrix over the mesh.  make_array_from_callback
    (not device_put) so the upload also works on MULTI-PROCESS global
    meshes (tests/test_multihost.py): each process materializes only its
    addressable row shards from the (replicated, deterministic) host
    matrix."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    axis = mesh.axis_names[0]
    sharding = NamedSharding(mesh, P(axis, None))
    return jax.make_array_from_callback(
        mat_u32.shape, sharding, lambda idx: mat_u32[idx]
    )


def _commit_fn(mesh, shape, n_e: int, rows: int):
    key = (id(mesh), shape, n_e, rows)
    fn = _COMMIT_FNS.get(key)
    if fn is None:
        import jax
        from jax.sharding import PartitionSpec as P

        from .ntt_dev import _encode_jit, _stage_tables

        axis = mesh.axis_names[0]
        tables = _stage_tables(n_e)
        pw = _pad_words(rows)

        def ligero_mesh_commit(mat_local):
            n1, n2, tws1, tws2, br1, br2, cross = tables
            enc = _encode_jit(mat_local, n_e, tws1, tws2, br1, br2, cross)
            enc_t = jax.lax.all_to_all(enc, axis, split_axis=1,
                                       concat_axis=0, tiled=True)
            dig = _sponge_columns(enc_t, rows, pw)
            # Replicate the (8, n_e/D) digest slices: the host needs the
            # whole blob, and a REPLICATED global array is np.asarray-able
            # even on multi-process meshes (a column-sharded one is not).
            return jax.lax.all_gather(dig, axis, axis=1, tiled=True)

        fn = _COMMIT_FNS[key] = jax.jit(jax.shard_map(
            ligero_mesh_commit, mesh=mesh,
            in_specs=P(axis, None), out_specs=P(None, None),
            # all_gather makes the output replicated in fact; VMA can't
            # infer it statically, so disable the check.
            check_vma=False,
        ))
    return fn


def commit_columns_mesh(mesh, mat_u32: np.ndarray, n_e: int):
    """Leaf-digest blob (n_e * 32 bytes) for the encoded columns of the
    (rows, n) canonical-u32 matrix, computed SPMD over ``mesh``; also
    returns the row-sharded device matrix for reuse by openings."""
    rows, _n = mat_u32.shape
    d = int(np.prod(mesh.devices.shape))
    rows_pad = -(-rows // d) * d
    if rows_pad != rows:
        mat_u32 = np.concatenate(
            [mat_u32, np.zeros((rows_pad - rows, mat_u32.shape[1]),
                               dtype=np.uint32)]
        )
    mat_dev = _shard_rows(mesh, np.ascontiguousarray(mat_u32))
    digests = _commit_fn(mesh, mat_dev.shape, n_e, rows)(mat_dev)
    blob = np.asarray(digests).T.astype("<u4").tobytes()
    return blob, mat_dev


def _gather_fn(mesh, shape, n_e: int, t: int):
    key = (id(mesh), shape, n_e, t)
    fn = _GATHER_FNS.get(key)
    if fn is None:
        import jax
        import jax.numpy as jnp
        from jax.sharding import PartitionSpec as P

        from .ntt_dev import _encode_jit, _stage_tables

        axis = mesh.axis_names[0]
        tables = _stage_tables(n_e)

        def ligero_mesh_gather(mat_local, idx):
            n1, n2, tws1, tws2, br1, br2, cross = tables
            enc = _encode_jit(mat_local, n_e, tws1, tws2, br1, br2, cross)
            opened = jnp.take(enc, idx, axis=1)
            # Replicate (see ligero_mesh_commit): rows_pad x t is tiny.
            return jax.lax.all_gather(opened, axis, axis=0, tiled=True)

        fn = _GATHER_FNS[key] = jax.jit(jax.shard_map(
            ligero_mesh_gather, mesh=mesh,
            in_specs=(P(axis, None), P()), out_specs=P(None, None),
            check_vma=False,
        ))
    return fn


class MeshEncoded:
    """``state.encoded`` stand-in for mesh-sharded commitments: holds the
    row-sharded device INPUT matrix; opened columns re-encode shard-
    locally and only the (rows, t) gather crosses devices."""

    def __init__(self, mesh, mat_dev, n_e: int, rows: int):
        self.mesh = mesh
        self.mat_dev = mat_dev
        self.n_e = n_e
        self.rows = rows

    def gather(self, indices) -> np.ndarray:
        import jax.numpy as jnp

        idx = jnp.asarray(np.asarray(indices, dtype=np.int32))
        fn = _gather_fn(self.mesh, self.mat_dev.shape, self.n_e, len(indices))
        out = np.asarray(fn(self.mat_dev, idx))  # (rows_pad, t)
        return out[: self.rows].T.astype(np.uint64)
