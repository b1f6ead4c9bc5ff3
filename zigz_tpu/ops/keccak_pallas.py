"""Pallas TPU kernel for batched Keccak-f[1600] (SHA3-256).

The jnp formulation of Keccak (ops/keccak.py) materializes every
intermediate to HBM — ~15 GB of traffic per 64k hashes — and lands at
~1 Mhash/s, HBM-bound.  This kernel keeps the whole 1600-bit state in
VMEM/registers for all 24 rounds: per hash only the message (8 or 64 B)
is read and the digest (32 B) written, making the permutation
compute-bound on the VPU.

Layout: hashes are laid out along (rows, 128) lanes; each 64-bit Keccak
lane is an (lo, hi) pair of (R, 128) uint32 tiles.  One grid program
processes R*128 hashes; rounds are unrolled at trace time inside the
kernel so Mosaic fuses the whole permutation.

Bit-exactness vs hashlib is enforced by tests/test_keccak.py (the
dispatcher in ops/keccak.py routes through this kernel on TPU and the
jnp fallback elsewhere).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["sha3_leaves_pallas", "sha3_merge_pallas", "ROWS_PER_PROGRAM"]

ROWS_PER_PROGRAM = 32  # 32*128 = 4096 hashes/program; state ~820 KB VMEM

_RC = [
    0x0000000000000001, 0x0000000000008082, 0x800000000000808A,
    0x8000000080008000, 0x000000000000808B, 0x0000000080000001,
    0x8000000080008081, 0x8000000000008009, 0x000000000000008A,
    0x0000000000000088, 0x0000000080008009, 0x000000008000000A,
    0x000000008000808B, 0x800000000000008B, 0x8000000000008089,
    0x8000000000008003, 0x8000000000008002, 0x8000000000000080,
    0x000000000000800A, 0x800000008000000A, 0x8000000080008081,
    0x8000000000008080, 0x0000000080000001, 0x8000000080008008,
]
_PILN = [10, 7, 11, 17, 18, 3, 5, 16, 8, 21, 24, 4, 15, 23, 19, 13, 12, 2, 20, 14, 22, 9, 6, 1]
_ROTC = [1, 3, 6, 10, 15, 21, 28, 36, 45, 55, 2, 14, 27, 41, 56, 8, 25, 43, 62, 18, 39, 61, 20, 44]


def _rotl(lo, hi, s):
    s %= 64
    if s == 0:
        return lo, hi
    if s == 32:
        return hi, lo
    if s < 32:
        return ((lo << s) | (hi >> (32 - s)), (hi << s) | (lo >> (32 - s)))
    s -= 32
    return ((hi << s) | (lo >> (32 - s)), (lo << s) | (hi >> (32 - s)))


def _permute(lanes):
    """Unrolled 24-round Keccak-f[1600] on 25 (lo, hi) value pairs."""
    for rnd in range(24):
        bc = []
        for i in range(5):
            lo = lanes[i][0] ^ lanes[i + 5][0] ^ lanes[i + 10][0] ^ lanes[i + 15][0] ^ lanes[i + 20][0]
            hi = lanes[i][1] ^ lanes[i + 5][1] ^ lanes[i + 10][1] ^ lanes[i + 15][1] ^ lanes[i + 20][1]
            bc.append((lo, hi))
        for i in range(5):
            rl, rh = _rotl(bc[(i + 1) % 5][0], bc[(i + 1) % 5][1], 1)
            tl = bc[(i + 4) % 5][0] ^ rl
            th = bc[(i + 4) % 5][1] ^ rh
            for j in range(0, 25, 5):
                lanes[j + i] = (lanes[j + i][0] ^ tl, lanes[j + i][1] ^ th)
        tl, th = lanes[1]
        for i in range(24):
            j = _PILN[i]
            tmp = lanes[j]
            lanes[j] = _rotl(tl, th, _ROTC[i])
            tl, th = tmp
        for j in range(0, 25, 5):
            row = [lanes[j + i] for i in range(5)]
            for i in range(5):
                nl = row[i][0] ^ (~row[(i + 1) % 5][0] & row[(i + 2) % 5][0])
                nh = row[i][1] ^ (~row[(i + 1) % 5][1] & row[(i + 2) % 5][1])
                lanes[j + i] = (nl, nh)
        lanes[0] = (
            lanes[0][0] ^ jnp.uint32(_RC[rnd] & 0xFFFFFFFF),
            lanes[0][1] ^ jnp.uint32(_RC[rnd] >> 32),
        )
    return lanes


def _leaves_kernel(in_ref, out_ref):
    """in: (2, R, 128) message (lo, hi); out: (8, R, 128) digest words."""
    lo = in_ref[0]
    hi = in_ref[1]
    zero = jnp.zeros_like(lo)
    lanes = [(zero, zero)] * 25
    lanes[0] = (lo, hi)
    lanes[1] = (jnp.full_like(lo, 0x06), zero)
    lanes[16] = (zero, jnp.full_like(lo, jnp.uint32(0x80000000)))
    out = _permute(lanes)
    for w in range(4):
        out_ref[2 * w] = out[w][0]
        out_ref[2 * w + 1] = out[w][1]


def _merge_kernel(in_ref, out_ref):
    """in: (16, R, 128) = 8 message lanes as (lo, hi); out: (8, R, 128)."""
    zero = jnp.zeros_like(in_ref[0])
    lanes = [(zero, zero)] * 25
    for lane in range(8):
        lanes[lane] = (in_ref[2 * lane], in_ref[2 * lane + 1])
    lanes[8] = (jnp.full_like(zero, 0x06), zero)
    lanes[16] = (zero, jnp.full_like(zero, jnp.uint32(0x80000000)))
    out = _permute(lanes)
    for w in range(4):
        out_ref[2 * w] = out[w][0]
        out_ref[2 * w + 1] = out[w][1]


def _make_call(kernel, in_words: int, rows: int):
    grid = (rows // ROWS_PER_PROGRAM,)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((8, rows, 128), jnp.uint32),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (in_words, ROWS_PER_PROGRAM, 128),
                lambda i: (0, i, 0),
                memory_space=pltpu.VMEM,
            )
        ],
        out_specs=pl.BlockSpec(
            (8, ROWS_PER_PROGRAM, 128),
            lambda i: (0, i, 0),
            memory_space=pltpu.VMEM,
        ),
    )


@partial(jax.jit, static_argnames=("rows",))
def _leaves_call(msg, rows):
    return _make_call(_leaves_kernel, 2, rows)(msg)


@partial(jax.jit, static_argnames=("rows",))
def _merge_call(msg, rows):
    return _make_call(_merge_kernel, 16, rows)(msg)


SUPER_CHUNK = 1 << 21  # hashes per full-size kernel launch (fewer
# dispatches: per-launch tunnel latency dominates the forest build)


def _bucket(n: int) -> int:
    """Pad a sub-SUPER_CHUNK count to a power-of-two bucket (min 1 program).

    Together with SUPER_CHUNK splitting this bounds the number of distinct
    compiled kernel shapes to ~log2(SUPER_CHUNK/4096)+1 per kernel —
    Mosaic compiles on the axon backend cost ~half a minute each, so
    arbitrary sizes (every Merkle level differs) must not each compile."""
    unit = ROWS_PER_PROGRAM * 128
    if n <= unit:
        return unit
    return 1 << (n - 1).bit_length()


def _run_chunked(call, kernel_words, arr, n):
    """arr: (W, N); apply the kernel in SUPER_CHUNK slabs + bucketed tail."""
    outs = []
    start = 0
    while start < n:
        size = min(SUPER_CHUNK, n - start)
        padded = SUPER_CHUNK if size == SUPER_CHUNK else _bucket(size)
        piece = arr[:, start : start + size]
        if padded != size:
            piece = jnp.pad(piece, ((0, 0), (0, padded - size)))
        rows = padded // 128
        out = call(piece.reshape(kernel_words, rows, 128), rows).reshape(8, padded)
        outs.append(out[:, :size] if padded != size else out)
        start += size
    return jnp.concatenate(outs, axis=-1) if len(outs) > 1 else outs[0]


def sha3_leaves_pallas(lo, hi) -> jnp.ndarray:
    """(N,) uint32 lo/hi message words -> (8, N) digest words."""
    n = lo.shape[-1]
    msg = jnp.stack([lo, hi])  # (2, N)
    return _run_chunked(_leaves_call, 2, msg, n)


def sha3_merge_pallas(msg16) -> jnp.ndarray:
    """(16, N) message words -> (8, N) digest words."""
    return _run_chunked(_merge_call, 16, msg16, msg16.shape[-1])
