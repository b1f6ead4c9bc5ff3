"""SHA3-256 (Keccak-f[1600]) as a TPU kernel — the Merkle hashing engine.

Keccak is 64-bit-rotate-heavy and therefore TPU-hostile in its natural
form (SURVEY.md §7 hard part 3); this implementation maps each 64-bit lane
onto a PAIR of uint32 arrays (lo, hi) so the whole permutation becomes
~5k elementwise uint32 VPU ops, batched over tens of thousands of
independent hashes per call.  XLA fuses the elementwise chains; all 24
rounds are unrolled at trace time.

Only the two message shapes the Merkle layer needs are implemented (both
single-block SHA3-256, rate 136):

* ``sha3_leaves``  — 8-byte messages (LE u64 field values);
* ``sha3_merge``   — 64-byte messages (digest pairs, tree nodes).

Fixed-shape chunking (CHUNK hashes per device call) keeps the number of
compiled graphs at two regardless of tree size.  Output digests live on
device as (8, N) uint32 (lo0,hi0,..,lo3,hi3 rows); bit-exactness against
hashlib is enforced by tests/test_keccak.py.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "keccak_f1600",
    "sha3_leaves",
    "sha3_merge",
    "digests_to_bytes",
    "CHUNK",
]

CHUNK = 1 << 16  # hashes per device call (fixed shape -> 2 compiles total)

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

# Rho rotation offsets in the (pi-ordered) lane walk, and the pi permutation.
_PILN = [10, 7, 11, 17, 18, 3, 5, 16, 8, 21, 24, 4, 15, 23, 19, 13, 12, 2, 20, 14, 22, 9, 6, 1]
_ROTC = [1, 3, 6, 10, 15, 21, 28, 36, 45, 55, 2, 14, 27, 41, 56, 8, 25, 43, 62, 18, 39, 61, 20, 44]


def _rotl64(lo, hi, s):
    """Rotate a 64-bit (lo, hi) uint32 pair left by a STATIC amount s."""
    s %= 64
    if s == 0:
        return lo, hi
    if s == 32:
        return hi, lo
    if s < 32:
        sh = jnp.uint32(s)
        inv = jnp.uint32(32 - s)
        nl = (lo << sh) | (hi >> inv)
        nh = (hi << sh) | (lo >> inv)
        return nl, nh
    s -= 32
    sh = jnp.uint32(s)
    inv = jnp.uint32(32 - s)
    nl = (hi << sh) | (lo >> inv)
    nh = (lo << sh) | (hi >> inv)
    return nl, nh


_RC_LO = np.array([rc & 0xFFFFFFFF for rc in _RC], dtype=np.uint32)
_RC_HI = np.array([rc >> 32 for rc in _RC], dtype=np.uint32)


def _round_body(rnd, state):
    """One Keccak round on stacked (25, ...) lo/hi arrays.  The round body
    is identical across rounds except the iota constant, so the 24 rounds
    run under lax.fori_loop — keeping the compiled graph ~200 ops instead
    of ~5000 (XLA compile time explodes on the fully unrolled version)."""
    slo, shi = state
    lanes = [(slo[i], shi[i]) for i in range(25)]

    # Theta
    bc = []
    for i in range(5):
        lo = lanes[i][0] ^ lanes[i + 5][0] ^ lanes[i + 10][0] ^ lanes[i + 15][0] ^ lanes[i + 20][0]
        hi = lanes[i][1] ^ lanes[i + 5][1] ^ lanes[i + 10][1] ^ lanes[i + 15][1] ^ lanes[i + 20][1]
        bc.append((lo, hi))
    for i in range(5):
        rl, rh = _rotl64(bc[(i + 1) % 5][0], bc[(i + 1) % 5][1], 1)
        tl = bc[(i + 4) % 5][0] ^ rl
        th = bc[(i + 4) % 5][1] ^ rh
        for j in range(0, 25, 5):
            lanes[j + i] = (lanes[j + i][0] ^ tl, lanes[j + i][1] ^ th)
    # Rho + Pi
    tl, th = lanes[1]
    for i in range(24):
        j = _PILN[i]
        tmp = lanes[j]
        lanes[j] = _rotl64(tl, th, _ROTC[i])
        tl, th = tmp
    # Chi
    for j in range(0, 25, 5):
        row = [lanes[j + i] for i in range(5)]
        for i in range(5):
            nl = row[i][0] ^ (~row[(i + 1) % 5][0] & row[(i + 2) % 5][0])
            nh = row[i][1] ^ (~row[(i + 1) % 5][1] & row[(i + 2) % 5][1])
            lanes[j + i] = (nl, nh)
    # Iota
    rc_lo = jnp.asarray(_RC_LO)[rnd]
    rc_hi = jnp.asarray(_RC_HI)[rnd]
    lanes[0] = (lanes[0][0] ^ rc_lo, lanes[0][1] ^ rc_hi)

    return jnp.stack([l for l, _ in lanes]), jnp.stack([h for _, h in lanes])


def keccak_f1600(lanes):
    """24-round permutation on a list of 25 (lo, hi) uint32 array pairs."""
    slo = jnp.stack([l for l, _ in lanes])
    shi = jnp.stack([h for _, h in lanes])
    slo, shi = jax.lax.fori_loop(0, 24, _round_body, (slo, shi))
    return [(slo[i], shi[i]) for i in range(25)]


def _zeros_like(ref):
    return jnp.zeros_like(ref)


@jax.jit
def _sha3_leaves_chunk(lo, hi):
    """SHA3-256 of N 8-byte messages given as (lo, hi) uint32 arrays."""
    z = _zeros_like(lo)
    lanes = [(z, z)] * 25
    lanes[0] = (lo, hi)
    # Padding: byte 8 = 0x06 (lane 1, byte 0); byte 135 = 0x80 (lane 16, byte 7).
    lanes[1] = (jnp.full_like(lo, 0x06), z)
    lanes[16] = (z, jnp.full_like(lo, jnp.uint32(0x80000000)))
    out = keccak_f1600(lanes)
    return jnp.stack(
        [out[0][0], out[0][1], out[1][0], out[1][1], out[2][0], out[2][1], out[3][0], out[3][1]]
    )


@jax.jit
def _sha3_merge_chunk(msg):
    """SHA3-256 of N 64-byte messages; msg is (16, N) uint32
    (lo0,hi0,...,lo7,hi7 = 8 u64 message lanes)."""
    z = jnp.zeros_like(msg[0])
    lanes = [(z, z)] * 25
    for lane in range(8):
        lanes[lane] = (msg[2 * lane], msg[2 * lane + 1])
    lanes[8] = (jnp.full_like(z, 0x06), z)
    lanes[16] = (z, jnp.full_like(z, jnp.uint32(0x80000000)))
    out = keccak_f1600(lanes)
    return jnp.stack(
        [out[0][0], out[0][1], out[1][0], out[1][1], out[2][0], out[2][1], out[3][0], out[3][1]]
    )


def _skip_chunking(arr) -> bool:
    """True when ``arr`` spans multiple devices: a sharded input must stay
    ONE program.  Eager slice/pad/concatenate on a multi-device array each
    lower to their own collective-bearing XLA programs, and a cascade of
    those can strand one participant of XLA:CPU's in-process rendezvous
    while the host thread is blocked dispatching the next eager op — the
    round-4 multichip-gate abort (rc 134), reproduced live this round with
    faulthandler stacks pointing at exactly this pad/slice cascade.
    Chunking exists to bound TPU compile count and VMEM footprint, neither
    of which applies to the virtual-CPU mesh; the jitted chunk kernels are
    shape-generic, so the full-width call is bit-identical."""
    try:
        return len(arr.sharding.device_set) > 1
    except Exception:
        return False


def _chunked(fn, arrays, n, out_rows):
    """Apply a fixed-CHUNK kernel over n items, padding the tail."""
    if _skip_chunking(arrays[0]):
        return fn(*arrays)
    outs = []
    for start in range(0, n, CHUNK):
        end = min(start + CHUNK, n)
        size = end - start
        if size == CHUNK:
            pieces = [a[..., start:end] for a in arrays]
        else:
            pieces = [
                jnp.pad(a[..., start:end], [(0, 0)] * (a.ndim - 1) + [(0, CHUNK - size)])
                for a in arrays
            ]
        res = fn(*pieces)
        outs.append(res[..., :size] if size != CHUNK else res)
    return jnp.concatenate(outs, axis=-1) if len(outs) > 1 else outs[0]


def _use_pallas() -> bool:
    import os

    pref = os.environ.get("ZIGZ_TPU_KECCAK", "auto")
    if pref == "jnp":
        return False
    if pref == "pallas":
        return True
    return jax.default_backend() == "tpu"


def sha3_leaves(values_u64) -> jnp.ndarray:
    """Digests (8, N) for N little-endian u64 leaf values (device array or
    numpy uint64)."""
    vals = np.asarray(values_u64, dtype=np.uint64)
    lo = jnp.asarray((vals & np.uint64(0xFFFFFFFF)).astype(np.uint32))
    hi = jnp.asarray((vals >> np.uint64(32)).astype(np.uint32))
    return sha3_leaves_device(lo, hi)


def sha3_leaves_device(lo, hi) -> jnp.ndarray:
    """Same as sha3_leaves but from on-device (lo, hi) uint32 arrays."""
    if _use_pallas():
        from .keccak_pallas import sha3_leaves_pallas

        return sha3_leaves_pallas(lo, hi)
    return _chunked(_sha3_leaves_chunk, (lo, hi), lo.shape[-1], 8)


@jax.jit
def _merge_msg(level):
    # Strided de-interleave — NOT a (..., 2) reshape: a trailing dim of 2
    # gets tile-padded to 128 lanes on TPU (64x transient memory blowup,
    # OOM at 2^20-scale forests).
    left = level[:, 0::2]
    right = level[:, 1::2]
    return jnp.concatenate([left, right], axis=0)  # (16, n)


def sha3_merge(level: jnp.ndarray) -> jnp.ndarray:
    """Parent digests (8, N/2) from child digests (8, N): children 2i and
    2i+1 concatenate into the 64-byte message of parent i."""
    n = level.shape[-1] // 2
    msg = _merge_msg(level)
    if _use_pallas():
        from .keccak_pallas import sha3_merge_pallas

        return sha3_merge_pallas(msg)
    return _chunked(_sha3_merge_chunk, (msg,), n, 8)


@jax.jit
def _merge_msg_halves(level):
    # Bit-reversed tree layout (device_forest): the children of parent j
    # sit at j and j + half — two CONTIGUOUS slices, no lane-strided
    # gather.  The strided `[:, 0::2]` de-interleave above measured ~10x
    # slower than leaf hashing on TPU (lane shuffles); this layout is the
    # fix and produces byte-identical trees.
    half = level.shape[-1] // 2
    return jnp.concatenate([level[:, :half], level[:, half:]], axis=0)  # (16, n)


def sha3_merge_halves(level: jnp.ndarray) -> jnp.ndarray:
    """Parent digests for the half-split (bit-reversed) pairing: children
    of parent j are positions j and j + N/2."""
    n = level.shape[-1] // 2
    msg = _merge_msg_halves(level)
    if _use_pallas():
        from .keccak_pallas import sha3_merge_pallas

        return sha3_merge_pallas(msg)
    return _chunked(_sha3_merge_chunk, (msg,), n, 8)


def digests_to_bytes(digests) -> bytes:
    """(8, N) device digests -> N*32 bytes (matching hashlib layout)."""
    arr = np.asarray(digests)  # (8, N) uint32
    n = arr.shape[-1]
    # Interleave rows into per-hash 8 little-endian u32 words.
    words = arr.T.astype("<u4")  # (N, 8)
    return words.tobytes()
