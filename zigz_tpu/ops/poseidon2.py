"""Poseidon2-over-BabyBear as a TPU kernel (Montgomery lanes).

The algebraic hash is the natural TPU Merkle hasher: one permutation is
~60 field multiplies + ~200 modular adds (vs ~5k bit-ops for a Keccak
permutation), and every operation maps directly onto the uint32 Montgomery
lanes of ops/babybear — no bit rotations at all.

Functions mirror zigz_tpu.core.poseidon2 exactly (same generated
parameters, same sponge framing); bit-equality against the host
implementation is enforced by tests/test_poseidon2.py.

State layout: 16 arrays of shape (N,) in Montgomery form, N parallel
hashes.  External-round M4 mixing uses addition chains (constants
1,3,4,5,6,7), so only the S-box and the internal diagonal use real
multiplies.  The 13 internal rounds run under lax.fori_loop to keep the
compiled graph small for the axon backend.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..core import poseidon2 as host
from .babybear import add_mod, from_mont, mont_mul, to_mont

__all__ = ["permute_device", "p2_leaves", "p2_merge", "limbs_to_bytes"]

T = host.T
RATE = host.RATE

def _mont_np(vals):
    """Montgomery-form constants as NUMPY (cached globally as numpy so no
    tracer ever leaks across jit scopes; jnp conversion happens per trace)."""
    from .babybear import P as BP, R_MOD_P

    return (
        np.array(vals, dtype=np.uint64) * np.uint64(R_MOD_P) % np.uint64(BP)
    ).astype(np.uint32)


_MU_NP = _mont_np(host._MU)
_RC_EXT_NP = _mont_np(host._RC_EXTERNAL)
_RC_INT_NP = _mont_np(host._RC_INTERNAL)


def _consts():
    return jnp.asarray(_MU_NP), jnp.asarray(_RC_EXT_NP), jnp.asarray(_RC_INT_NP)


def _sbox(x):
    x2 = mont_mul(x, x)
    x4 = mont_mul(x2, x2)
    return mont_mul(mont_mul(x4, x2), x)


def _mul_small(x, c):
    """c*x for c in {1,3,4,5,6,7} via addition chains (form-agnostic)."""
    if c == 1:
        return x
    x2 = add_mod(x, x)
    if c == 3:
        return add_mod(x2, x)
    x4 = add_mod(x2, x2)
    if c == 4:
        return x4
    if c == 5:
        return add_mod(x4, x)
    if c == 6:
        return add_mod(x4, x2)
    return add_mod(add_mod(x4, x2), x)  # 7


def _external_linear(s):
    out = [None] * T
    for b in range(0, T, 4):
        for i in range(4):
            acc = _mul_small(s[b], host._M4[i][0])
            for j in range(1, 4):
                acc = add_mod(acc, _mul_small(s[b + j], host._M4[i][j]))
            out[b + i] = acc
    col = [out[i] for i in range(4)]
    for b in range(4, T, 4):
        for i in range(4):
            col[i] = add_mod(col[i], out[b + i])
    for b in range(0, T, 4):
        for i in range(4):
            out[b + i] = add_mod(out[b + i], col[i])
    return out


def _internal_round(r, state):
    mu, _, rc_int = _consts()
    s = [state[i] for i in range(T)]
    s0 = _sbox(add_mod(s[0], jnp.broadcast_to(rc_int[r], s[0].shape)))
    s = [s0] + s[1:]
    total = s[0]
    for i in range(1, T):
        total = add_mod(total, s[i])
    out = [add_mod(total, mont_mul(jnp.broadcast_to(mu[i], s[i].shape), s[i])) for i in range(T)]
    return jnp.stack(out)


def _external_round(r, state):
    """One external round with rc row r: add constants, S-box, linear."""
    _, rc_ext, _ = _consts()
    rc_row = rc_ext.reshape(host.ROUNDS_F, T)[r]
    s = [
        _sbox(add_mod(state[i], jnp.broadcast_to(rc_row[i], state[i].shape)))
        for i in range(T)
    ]
    return jnp.stack(_external_linear(s))


def permute_device(state):
    """state: list of T (N,) mont arrays -> list of T (N,) mont arrays.

    All three round groups run under fori_loop so the compiled graph stays
    at ~1 round body each (the fully unrolled form takes minutes of XLA
    compile, same pathology as the Keccak kernel)."""
    stacked = jnp.stack(_external_linear(list(state)))
    half = host.ROUNDS_F // 2
    stacked = jax.lax.fori_loop(0, half, _external_round, stacked)
    stacked = jax.lax.fori_loop(0, host.ROUNDS_P, _internal_round, stacked)
    stacked = jax.lax.fori_loop(half, host.ROUNDS_F, _external_round, stacked)
    return [stacked[i] for i in range(T)]


@jax.jit
def _p2_leaves_jit(values_canonical):
    """(N,) canonical uint32 leaf values -> (8, N) canonical digest limbs."""
    n = values_canonical.shape[0]
    zero = jnp.zeros_like(values_canonical)
    one_mont = to_mont(jnp.full_like(values_canonical, 1))  # len = 1 in capacity
    state = [to_mont(values_canonical)] + [zero] * (RATE - 1) + [one_mont] + [zero] * (T - RATE - 1)
    out = permute_device(state)
    return jnp.stack([from_mont(out[i]) for i in range(8)])


@jax.jit
def _p2_merge_jit(level):
    """(8, N) canonical digest limbs -> (8, N/2) parent limbs.

    Children 2i, 2i+1 form a 16-limb message: two rate-8 absorb blocks."""
    left = [to_mont(level[i][0::2]) for i in range(8)]
    right = [to_mont(level[i][1::2]) for i in range(8)]
    zero = jnp.zeros_like(left[0])
    len_mont = to_mont(jnp.full_like(left[0], 16))
    state = list(left) + [len_mont] + [zero] * (T - RATE - 1)
    state = permute_device(state)
    state = [add_mod(state[i], right[i]) for i in range(8)] + state[8:]
    state = permute_device(state)
    return jnp.stack([from_mont(state[i]) for i in range(8)])


SUPER_CHUNK = 1 << 16  # hashes per kernel launch (bounds compile count)


def _bucket(n: int, floor: int = 32) -> int:
    """Pad to a power-of-two bucket in [floor, SUPER_CHUNK] — each distinct
    jit shape costs ~10s of XLA CPU compile and minutes on axon, so sizes
    are capped at SUPER_CHUNK slabs with bucketed tails."""
    n = max(n, floor)
    return 1 << (n - 1).bit_length()


def _chunked(fn, arr, n, pad_spec):
    outs = []
    start = 0
    while start < n:
        size = min(SUPER_CHUNK, n - start)
        padded = SUPER_CHUNK if size == SUPER_CHUNK else _bucket(size)
        piece = arr[..., start : start + size]
        if padded != size:
            piece = jnp.pad(piece, pad_spec + [(0, padded - size)])
        out = fn(piece)
        outs.append(out[..., : size] if padded != size else out)
        start += size
    return jnp.concatenate(outs, axis=-1) if len(outs) > 1 else outs[0]


def p2_leaves(values) -> jnp.ndarray:
    if isinstance(values, jnp.ndarray):
        # Device-resident canonical uint32 values: hash in place, no host
        # round-trip (the Merkle-forest hot path).
        return _chunked(_p2_leaves_jit, values, values.shape[-1], [])
    vals = np.asarray(values, dtype=np.uint64) % np.uint64(host.P)
    return _chunked(_p2_leaves_jit, jnp.asarray(vals.astype(np.uint32)), vals.shape[-1], [])


def p2_merge_halves(level) -> jnp.ndarray:
    """Half-split pairing variant for the bit-reversed forest layout:
    children of parent j are positions j and j + N/2 (contiguous slices)."""
    half = level.shape[-1] // 2
    left = level[:, :half]
    right = level[:, half:]
    outs = []
    start = 0
    while start < half:
        size = min(SUPER_CHUNK, half - start)
        padded = SUPER_CHUNK if size == SUPER_CHUNK else _bucket(size, 16)
        l_piece = left[:, start : start + size]
        r_piece = right[:, start : start + size]
        if padded != size:
            l_piece = jnp.pad(l_piece, ((0, 0), (0, padded - size)))
            r_piece = jnp.pad(r_piece, ((0, 0), (0, padded - size)))
        out = _p2_merge_lr_jit(l_piece, r_piece)
        outs.append(out[:, :size] if padded != size else out)
        start += size
    return jnp.concatenate(outs, axis=-1) if len(outs) > 1 else outs[0]


@jax.jit
def _p2_merge_lr_jit(left, right):
    """(8, n) left + (8, n) right canonical limbs -> (8, n) parent limbs."""
    l = [to_mont(left[i]) for i in range(8)]
    r = [to_mont(right[i]) for i in range(8)]
    zero = jnp.zeros_like(l[0])
    len_mont = to_mont(jnp.full_like(l[0], 16))
    state = list(l) + [len_mont] + [zero] * (T - RATE - 1)
    state = permute_device(state)
    state = [add_mod(state[i], r[i]) for i in range(8)] + state[8:]
    state = permute_device(state)
    return jnp.stack([from_mont(state[i]) for i in range(8)])


def p2_merge(level) -> jnp.ndarray:
    n = level.shape[-1]
    # Chunk boundaries must fall on child pairs: operate on pair-count.
    outs = []
    start = 0
    while start < n:
        size = min(2 * SUPER_CHUNK, n - start)
        padded = 2 * SUPER_CHUNK if size == 2 * SUPER_CHUNK else 2 * _bucket(size // 2, 16)
        piece = level[:, start : start + size]
        if padded != size:
            piece = jnp.pad(piece, ((0, 0), (0, padded - size)))
        out = _p2_merge_jit(piece)
        outs.append(out[:, : size // 2] if padded != size else out)
        start += size
    return jnp.concatenate(outs, axis=-1) if len(outs) > 1 else outs[0]


def limbs_to_bytes(digests) -> bytes:
    """(8, N) canonical limbs -> N*32 bytes (4-byte LE limbs, matching
    core.poseidon2.hash_field_values output)."""
    arr = np.asarray(digests, dtype=np.uint32)
    return arr.T.astype("<u4").tobytes()
