"""On-device witness construction from compact trace columns.

The witness matrix is 43 * 8 bytes per step; the trace columns it derives
from are ~48 bytes per step.  On tunnel-attached TPUs the host->device
transfer is a dominant prover cost, so this module ships the COMPACT
columns and rebuilds the 43 witness rows on device:

* u64 -> mod-p reduction from (lo, hi) uint32 pairs via the Montgomery
  lanes;
* the 32 register rows via a single associative scan (forward-fill of the
  per-step write deltas — trace padding uses "no write" so the
  pad-with-last rule falls out of the scan);
* instruction/memory rows with zero padding, pc with pad-last (padded on
  host where the rule is known).

Output: (43, 2^v) canonical uint32 device array in the exact commitment
row order of constraints/witness.py — bit-equality with the host witness
generator is enforced by tests/test_witness_dev.py.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .babybear import P, from_mont, mont_mul, to_mont

__all__ = ["pack_trace_columns", "build_witness_device"]

_C32_MOD_P = (1 << 32) % P
_M32 = np.uint64(0xFFFFFFFF)


def _mod_u64(lo, hi):
    """(lo, hi) uint32 words -> (lo + 2^32 hi) mod p, canonical uint32."""
    lo_mod = lo % jnp.uint32(P)
    hi_mod = hi % jnp.uint32(P)
    prod = from_mont(mont_mul(to_mont(hi_mod), to_mont(jnp.full_like(hi_mod, _C32_MOD_P))))
    s = prod + lo_mod  # < 2p, fits uint32
    return jnp.where(s >= jnp.uint32(P), s - jnp.uint32(P), s)


def pack_trace_columns(trace, initial_regs, num_vars: int):
    """Host-side packing: native trace columns -> padded compact arrays.

    Padding (to 2^v): pc repeats the last value (witness.zig:79-91); the
    register delta columns pad with wr_idx=0 ("no write", so the scan
    carries the last value — witness.zig:113-123); instruction and memory
    columns pad with zero (witness.zig:173-182, :248-253)."""
    cols = trace.columns
    n = trace.step_count()
    padded = 1 << num_vars

    def pad_last(arr):
        out = np.zeros(padded, dtype=arr.dtype)
        out[:n] = arr
        if padded > n and n > 0:
            out[n:] = arr[n - 1]
        return out

    def pad_zero(arr, dtype=None):
        out = np.zeros(padded, dtype=dtype or arr.dtype)
        out[:n] = arr
        return out

    def split64(arr_u64):
        a = np.asarray(arr_u64, dtype=np.uint64)
        return (a & _M32).astype(np.uint32), (a >> np.uint64(32)).astype(np.uint32)

    pc_lo, pc_hi = split64(pad_last(cols["pc"]))
    # imm is a sign-extended <= 32-bit immediate bitcast to u64, so its
    # high word is determined by bit 31 of the low word — recomputed on
    # device, never shipped.
    imm_lo, _ = split64(pad_zero(cols["imm"].astype(np.uint64)))
    wr_val_lo, wr_val_hi = split64(pad_zero(cols["reg_write_val"]))
    mem_flag = pad_zero(cols["mem_flag"], np.uint8)
    has_mem = cols["mem_flag"] != 0
    mem_addr_lo, mem_addr_hi = split64(pad_zero(np.where(has_mem, cols["mem_addr"], 0)))
    mem_val_lo, mem_val_hi = split64(pad_zero(np.where(has_mem, cols["mem_val"], 0)))

    # Instruction-field columns fit u8 (opcode < 128, regs < 32, funct7 <
    # 128) — a 4x transfer cut on tunnel-attached devices.
    return {
        "pc_lo": pc_lo, "pc_hi": pc_hi,
        "opcode": pad_zero(cols["opcode"].astype(np.uint8)),
        "rd": pad_zero(cols["rd"].astype(np.uint8)),
        "rs1": pad_zero(cols["rs1"].astype(np.uint8)),
        "rs2": pad_zero(cols["rs2"].astype(np.uint8)),
        "funct3": pad_zero(cols["funct3"].astype(np.uint8)),
        "funct7": pad_zero(cols["funct7"].astype(np.uint8)),
        "imm_lo": imm_lo,
        "wr_idx": pad_zero(cols["reg_write_idx"].astype(np.uint8)),
        "wr_val_lo": wr_val_lo, "wr_val_hi": wr_val_hi,
        "mem_flag": mem_flag,
        "mem_addr_lo": mem_addr_lo, "mem_addr_hi": mem_addr_hi,
        "mem_val_lo": mem_val_lo, "mem_val_hi": mem_val_hi,
        "initial_regs": (np.asarray(initial_regs, dtype=np.uint64) % np.uint64(P)).astype(np.uint32),
    }


def _ffill_combine(left, right):
    """Associative 'last write wins' operator on (value, has_write)."""
    lv, lm = left
    rv, rm = right
    return jnp.where(rm, rv, lv), lm | rm


@jax.jit
def _build_witness_jit(packed):
    p32 = jnp.uint32(P)

    pc = _mod_u64(packed["pc_lo"], packed["pc_hi"])
    imm_lo = packed["imm_lo"]
    imm_hi = jnp.where(
        (imm_lo >> jnp.uint32(31)) == 1, jnp.uint32(0xFFFFFFFF), jnp.uint32(0)
    )
    imm = _mod_u64(imm_lo, imm_hi)
    wr_val = _mod_u64(packed["wr_val_lo"], packed["wr_val_hi"])
    mem_addr = _mod_u64(packed["mem_addr_lo"], packed["mem_addr_hi"])
    mem_val = _mod_u64(packed["mem_val_lo"], packed["mem_val_hi"])
    is_read = (packed["mem_flag"] == 1).astype(jnp.uint32)

    # Registers: (32, N) forward-fill of write deltas, seeded with the
    # initial register values (mod p).
    wr_idx = packed["wr_idx"].astype(jnp.uint32)  # (N,)
    regs = jnp.arange(32, dtype=jnp.uint32)[:, None]
    mask = wr_idx[None, :] == regs  # (32, N)
    vals = jnp.where(mask, wr_val[None, :], jnp.uint32(0))
    filled, has = jax.lax.associative_scan(_ffill_combine, (vals, mask), axis=1)
    init_mod = packed["initial_regs"][:, None]  # pre-reduced uint32 on host
    reg_rows = jnp.where(has, filled, init_mod)
    reg_rows = reg_rows.at[0].set(jnp.zeros_like(reg_rows[0]))  # x0 hardwired

    small = [
        packed[k].astype(jnp.uint32) % p32
        for k in ("opcode", "rd", "rs1", "rs2", "funct3", "funct7")
    ]
    rows = [pc] + [reg_rows[i] for i in range(32)] + small + [imm, mem_addr, mem_val, is_read]
    return jnp.stack(rows)


def build_witness_device(trace, initial_regs, num_vars: int, mesh=None):
    """-> (43, 2^v) canonical uint32 device array (commitment row order).

    With a ``mesh`` the per-step columns are placed sharded over the trace
    axis, so the build (elementwise mod-p + the register forward-fill
    scan) runs SPMD and the output inherits a (replicated, "trace")
    sharding — the scan's cross-shard carry is the only collective."""
    packed = pack_trace_columns(trace, initial_regs, num_vars)
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        col = NamedSharding(mesh, P("trace"))
        rep = NamedSharding(mesh, P())
        dev = {
            k: jax.device_put(jnp.asarray(v), rep if k == "initial_regs" else col)
            for k, v in packed.items()
        }
        return _build_witness_jit(dev)
    return _build_witness_jit({k: jnp.asarray(v) for k, v in packed.items()})
