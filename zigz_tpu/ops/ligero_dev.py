"""Device-resident Ligero commitments: encode, hash, and gather on TPU.

For matrices that already live on device (the v4 witness built by
ops/witness_dev.py), a Ligero commitment can be produced without ever
shipping the matrix through the host<->device link:

* Reed-Solomon row encoding on device (ops/ntt_dev.py four-step NTT);
* per-COLUMN SHA3-256 leaf digests in a Pallas kernel that keeps the
  whole Keccak state in VMEM across all absorb blocks (one column =
  rows 4-byte LE words, the v2+ narrow leaf preimage of
  commitments/ligero.py _hash_columns);
* only the (n_e, 32B) digest blob crosses the link; Merkle levels build
  with the threaded host runtime as usual.

The kernel is self-tested against hashlib once per process (as the
native C++ backends are) and never used on mismatch; the verifier
independently recomputes leaf hashes of every opened column on host, so
a defect could only ever produce rejected proofs, not accepted wrong
ones.  Off-TPU backends fall back to downloading the encoded matrix and
hashing on host (tests run this path; the kernel needs Mosaic).
"""

from __future__ import annotations

from functools import partial
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["sha3_columns_device", "device_hash_available"]

_RATE_WORDS = 34  # 136-byte Keccak rate as u32 words
P_BB = 2013265921  # BabyBear

_state = {"tested": None}  # None = untested, True/False


def _pad_words(r: int) -> int:
    """Padded u32 word count: full blocks plus the pad block."""
    return ((r * 4) // 136 + 1) * _RATE_WORDS


def _kernel(nb: int):
    """Streaming-absorb kernel: grid (col_chunks, nb), one 136-byte block
    per grid step, Keccak state carried across the block dimension in
    VMEM scratch (~200 KB) — only one (34, LR, 128) message slab is
    resident at a time, so the row count is unbounded."""
    from jax.experimental import pallas as pl

    from .keccak_pallas import _permute

    def body(in_ref, out_ref, state_ref):
        b = pl.program_id(1)

        @pl.when(b == 0)
        def _init():
            state_ref[...] = jnp.zeros_like(state_ref)

        packed = state_ref[...]
        lanes = [(packed[2 * k], packed[2 * k + 1]) for k in range(25)]
        for k in range(17):
            lanes[k] = (lanes[k][0] ^ in_ref[2 * k], lanes[k][1] ^ in_ref[2 * k + 1])
        lanes = _permute(lanes)
        state_ref[...] = jnp.stack([h for pair in lanes for h in pair])

        @pl.when(b == nb - 1)
        def _emit():
            for w in range(4):
                out_ref[2 * w] = lanes[w][0]
                out_ref[2 * w + 1] = lanes[w][1]

    return body


_LANE_ROWS = 8  # (rows-of-128) per program; sublane dim must be >= 8


@partial(jax.jit, static_argnames=("nb", "rows"))
def _columns_call(msg, nb, rows):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    grid = (rows // _LANE_ROWS, nb)
    return pl.pallas_call(
        _kernel(nb),
        out_shape=jax.ShapeDtypeStruct((8, rows, 128), jnp.uint32),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (_RATE_WORDS, _LANE_ROWS, 128),
                lambda i, b: (b, i, 0),
                memory_space=pltpu.VMEM,
            )
        ],
        out_specs=pl.BlockSpec(
            (8, _LANE_ROWS, 128),
            lambda i, b: (0, i, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[pltpu.VMEM((50, _LANE_ROWS, 128), jnp.uint32)],
    )(msg)


def _hash_columns_raw(encoded, r: int):
    """(r, n) uint32 device -> (8, n) digest words; n % (LANE_ROWS*128) == 0."""
    n = encoded.shape[1]
    pw = _pad_words(r)
    msg = jnp.zeros((pw, n), jnp.uint32)
    msg = msg.at[:r].set(encoded)
    msg = msg.at[r].set(jnp.uint32(0x06))  # pad start (always < pw)
    # 0x80 in the final byte of the last block; the two pad bits never
    # collide in-word (0x06 is byte 0, 0x80 is byte 3), so add == xor.
    msg = msg.at[pw - 1].add(jnp.uint32(0x80000000))
    rows = n // 128
    out = _columns_call(msg.reshape(pw, rows, 128), pw // _RATE_WORDS, rows)
    return out.reshape(8, n)


def _self_test() -> bool:
    """Digest parity vs hashlib for awkward row counts (block boundary,
    odd, power-of-two)."""
    import hashlib

    rng = np.random.default_rng(3)
    n = _LANE_ROWS * 128
    for r in (1, 33, 34, 64, 688):
        mat = rng.integers(0, 1 << 31, size=(r, n), dtype=np.uint32)
        got = np.asarray(_hash_columns_raw(jnp.asarray(mat), r))
        blob = got.T.astype("<u4").tobytes()
        for j in (0, n - 1):
            want = hashlib.sha3_256(
                np.ascontiguousarray(mat[:, j]).astype("<u4").tobytes()
            ).digest()
            if blob[j * 32 : (j + 1) * 32] != want:
                return False
    return True


def device_hash_available() -> bool:
    if _state["tested"] is None:
        try:
            _state["tested"] = (jax.default_backend() == "tpu") and _self_test()
        except Exception:
            _state["tested"] = False
    return _state["tested"]


def ligero_commit_device(F, names, rows_dev, hash_mode: str = "sha3",
                         params=None):
    """Device twin of commitments/ligero.py ligero_commit for a matrix
    that already lives on device.

    ``rows_dev`` is a (B, 2^v) canonical uint32 device array whose rows
    are the MLEs in ``sorted(names)`` order (the host commit sorts its
    dict the same way).  The root, leaf digests, and Merkle levels are
    byte-identical to the host path; the matrix and encoded matrix stay
    on device (commitments/ligero.py's downstream helpers branch on the
    array type).  SHA3 only — it is the v4 hash mode."""
    from ..commitments.ligero import (
        LigeroCommitState,
        LigeroParams,
        _build_levels,
    )
    from .ntt_dev import encode_rows_device

    assert hash_mode == "sha3", "device Ligero commit is SHA3-only"
    params = params or LigeroParams()
    num_polys, size = rows_dev.shape
    num_vars = size.bit_length() - 1
    cn = params.choose_split(num_vars, num_polys)
    n = 1 << cn
    m = size // n
    mat = rows_dev.reshape(num_polys * m, n)
    encoded = encode_rows_device(mat, params.inv_rate * n)
    leaf_digests = sha3_columns_device(encoded)
    levels = _build_levels(leaf_digests, hash_mode)
    return LigeroCommitState(
        root=levels[-1],
        names=list(names),
        num_vars=num_vars,
        cn=cn,
        m=m,
        n=n,
        n_e=params.inv_rate * n,
        matrix=mat,
        encoded=encoded,
        leaf_digests=leaf_digests,
        levels=levels,
        hash_mode=hash_mode,
    )


def vecmat_device(a: np.ndarray, matrix) -> np.ndarray:
    """out[j] = sum_i a[i]*M[i, j] mod p for a device-resident canonical
    uint32 matrix; returns host uint64 canonical (a is host-side)."""
    from .babybear import from_mont, mont_mul, np_to_mont, to_mont
    from .mle import sum_mod

    a_m = jnp.asarray(np_to_mont(np.asarray(a, dtype=np.uint64) % np.uint64(P_BB)))
    prods = mont_mul(to_mont(matrix), a_m[:, None])
    return np.asarray(from_mont(sum_mod(prods, axis=0)), dtype=np.uint64)


def column_evals_device(state, a: np.ndarray, b: np.ndarray) -> Dict[str, int]:
    """Per-column MLE evaluations a^T M_k b for all blocks of a device
    commit state in one batched pass."""
    from .babybear import from_mont, mont_mul, np_to_mont, to_mont
    from .mle import sum_mod

    B = len(state.names)
    a_m = jnp.asarray(np_to_mont(np.asarray(a, dtype=np.uint64) % np.uint64(P_BB)))
    b_m = jnp.asarray(np_to_mont(np.asarray(b, dtype=np.uint64) % np.uint64(P_BB)))
    mat_m = to_mont(state.matrix).reshape(B, state.m, state.n)
    u = sum_mod(mont_mul(mat_m, a_m[None, :, None]), axis=1)  # (B, n)
    vals = from_mont(sum_mod(mont_mul(u, b_m[None, :]), axis=-1))  # (B,)
    host = np.asarray(vals, dtype=np.uint64)
    return {name: int(host[k]) for k, name in enumerate(state.names)}


def sha3_columns_device(encoded) -> bytes:
    """Leaf-digest blob (n * 32 bytes) for the columns of a device (r, n)
    uint32 canonical matrix — byte-identical to commitments/ligero.py
    _hash_columns(encoded, "sha3").  Falls back to downloading + host
    hashing when the kernel is unavailable (non-TPU backends)."""
    r, n = encoded.shape
    if not device_hash_available():
        from ..commitments.ligero import _hash_columns

        return _hash_columns(np.asarray(encoded), "sha3")
    unit = _LANE_ROWS * 128
    pad = (-n) % unit
    if pad:
        encoded = jnp.pad(encoded, ((0, 0), (0, pad)))
    out = np.asarray(_hash_columns_raw(encoded, r))
    if pad:
        out = out[:, :n]
    return out.T.astype("<u4").tobytes()


# ---------------------------------------------------------------------------
# Streaming commit: row-blocked encode + state-carrying column absorb.
#
# A 2^20-scale mixed commitment's encoded matrix (rows x 4n u32) plus the
# four-step NTT transposes and the padded Keccak message exceed a single
# chip's HBM.  This path never materializes the encoded matrix: input rows
# ride up in blocks, each block is Reed-Solomon-encoded on device and
# absorbed into a carried (50, n_e) Keccak state (26 MB at 2^20); only the
# 32-byte-per-column digest blob rides down.  Openings re-encode the same
# device-resident input blocks and gather just the opened columns.

_STREAM_BLOCK_WORDS = 34 * 16  # 544 rows per absorb step (multiple of 34)


def _absorb_kernel(nb: int):
    from jax.experimental import pallas as pl

    from .keccak_pallas import _permute

    def body(state_in_ref, in_ref, state_out_ref, scratch):
        b = pl.program_id(1)

        @pl.when(b == 0)
        def _init():
            scratch[...] = state_in_ref[...]

        packed = scratch[...]
        lanes = [(packed[2 * k], packed[2 * k + 1]) for k in range(25)]
        for k in range(17):
            lanes[k] = (lanes[k][0] ^ in_ref[2 * k], lanes[k][1] ^ in_ref[2 * k + 1])
        lanes = _permute(lanes)
        scratch[...] = jnp.stack([h for pair in lanes for h in pair])

        @pl.when(b == nb - 1)
        def _emit():
            state_out_ref[...] = scratch[...]

    return body


@partial(jax.jit, static_argnames=("nb", "rows"), donate_argnums=(0,))
def _absorb_call(state, msg, nb, rows):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    grid = (rows // _LANE_ROWS, nb)
    return pl.pallas_call(
        _absorb_kernel(nb),
        out_shape=jax.ShapeDtypeStruct((50, rows, 128), jnp.uint32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((50, _LANE_ROWS, 128), lambda i, b: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_RATE_WORDS, _LANE_ROWS, 128), lambda i, b: (b, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((50, _LANE_ROWS, 128), lambda i, b: (0, i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((50, _LANE_ROWS, 128), jnp.uint32)],
    )(state, msg)


def sha3_columns_stream_device(mat_dev, n_e: int) -> bytes:
    """Leaf digests of the VIRTUAL encoded matrix NTT(mat_dev rows, n_e)
    without materializing it: byte-identical to
    _hash_columns(ntt_pow2_u32(mat, n_e), "sha3").

    All device calls use fixed shapes — (block, n) encodes, (block, n_pad)
    full-span absorbs, (34, n_pad) single-block tail absorbs — so a
    commitment compiles at most three kernels per (n, n_e) regardless of
    its row count."""
    rows, n = mat_dev.shape
    pw = _pad_words(rows)
    unit = _LANE_ROWS * 128
    n_pad = n_e + ((-n_e) % unit)
    rows128 = n_pad // 128
    state = jnp.zeros((50, rows128, 128), jnp.uint32)
    bw = _STREAM_BLOCK_WORDS
    mat_padded = jnp.pad(mat_dev, ((0, bw), (0, 0)))
    from .ntt_dev import encode_rows_device

    def message_block(k0: int):
        """Fixed-shape (bw, n_pad) message span starting at word k0 (zero
        rows beyond the true stream are sliced off by the caller)."""
        blk_in = jax.lax.dynamic_slice(mat_padded, (min(k0, rows), 0), (bw, n))
        enc = encode_rows_device(blk_in, n_e)
        out = jnp.zeros((bw, n_pad), jnp.uint32)
        live = max(0, min(rows - k0, bw))
        if live:
            mask = (jnp.arange(bw) < live)[:, None]
            out = out.at[:, :n_e].set(jnp.where(mask, enc, 0))
        if k0 <= rows < k0 + bw:
            out = out.at[rows - k0, :n_e].set(jnp.uint32(0x06))
        if k0 <= pw - 1 < k0 + bw:
            out = out.at[pw - 1 - k0, :n_e].add(jnp.uint32(0x80000000))
        return out

    k0 = 0
    while k0 + bw <= pw:
        blk = message_block(k0)
        state = _absorb_call(state, blk.reshape(bw, rows128, 128),
                             bw // _RATE_WORDS, rows128)
        k0 += bw
    if k0 < pw:
        blk = message_block(k0)
        for j in range((pw - k0) // _RATE_WORDS):
            one = jax.lax.dynamic_slice(
                blk, (j * _RATE_WORDS, 0), (_RATE_WORDS, n_pad)
            )
            state = _absorb_call(
                state, one.reshape(_RATE_WORDS, rows128, 128), 1, rows128
            )
    out = np.asarray(state[:8]).reshape(8, n_pad)[:, :n_e]
    return out.T.astype("<u4").tobytes()


def gather_encoded_columns_device(mat_dev, n_e: int, indices) -> np.ndarray:
    """(t, rows) opened columns of the virtual encoded matrix: re-encode
    the device-resident input in fixed-shape row blocks, gather only
    ``indices``."""
    from .ntt_dev import encode_rows_device

    rows, n = mat_dev.shape
    idx = jnp.asarray(indices)
    bw = _STREAM_BLOCK_WORDS
    mat_padded = jnp.pad(mat_dev, ((0, bw), (0, 0)))
    parts = []
    for k0 in range(0, rows, bw):
        blk_in = jax.lax.dynamic_slice(mat_padded, (k0, 0), (bw, n))
        enc = encode_rows_device(blk_in, n_e)
        live = min(rows - k0, bw)
        parts.append(np.asarray(jnp.take(enc, idx, axis=1))[:live])
    return np.concatenate(parts, axis=0).T.astype(np.uint64)


class StreamedEncoded:
    """state.encoded stand-in for streamed device commitments: holds the
    device-resident INPUT matrix; opened columns re-encode on demand."""

    def __init__(self, mat_dev, n_e: int):
        self.mat_dev = mat_dev
        self.n_e = n_e

    def gather(self, indices) -> np.ndarray:
        return gather_encoded_columns_device(self.mat_dev, self.n_e, indices)
