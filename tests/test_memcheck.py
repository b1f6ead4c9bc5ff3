"""RAM byte-level offline memory check (constraints/memcheck.py).

The reference constrains data memory not at all (memory.zig is
execution-only); these tests gate our Spice-style byte-cell argument:
loads must return the last-stored byte (or the public initial image),
with forged values/timestamps/final-state rejected.
"""

import numpy as np
import pytest

from zigz_tpu.core.field import BabyBear as F
from zigz_tpu.core.hash import FiatShamirTranscript
from zigz_tpu.constraints.memcheck import (
    ByteAccessColumns,
    extract_byte_accesses,
    initial_memory_map,
    prove_memcheck,
    verify_memcheck,
)
from zigz_tpu.vm.trace import AccessType, MemoryAccess

P = F.MODULUS


class _FakeTrace:
    def __init__(self, accesses):
        self.memory_accesses = accesses


def _ld(addr, value, size=3):
    return MemoryAccess(AccessType.Load, addr, value, size)


def _st(addr, value, size=3):
    return MemoryAccess(AccessType.Store, addr, value, size)


def _sim(n, seed=0, init=None, num_addrs=6, base=0x2000):
    """Random but CONSISTENT byte-memory history of n load/store steps."""
    r = np.random.default_rng(seed)
    mem = dict(init or {})
    accesses = [None] * 3  # some non-memory steps interleaved
    for _ in range(n):
        size = int(r.integers(0, 4))
        nbytes = 1 << size
        addr = base + int(r.integers(0, num_addrs)) * 8
        if r.integers(0, 2):
            value = int(r.integers(0, 1 << (8 * nbytes), dtype=np.uint64))
            for k in range(nbytes):
                mem[addr + k] = (value >> (8 * k)) & 0xFF
            accesses.append(_st(addr, value, size))
        else:
            raw = 0
            for k in range(nbytes):
                raw |= mem.get(addr + k, 0) << (8 * k)
            accesses.append(_ld(addr, raw, size))
        accesses.append(None)
    return _FakeTrace(accesses)


def _roundtrip(trace, init_mem):
    access = extract_byte_accesses(trace, init_mem)
    mc = prove_memcheck(F, FiatShamirTranscript(), access, init_mem)
    n_steps = len(trace.memory_accesses)
    return mc, verify_memcheck(F, FiatShamirTranscript(), mc, n_steps, init_mem)


def test_honest_roundtrip():
    trace = _sim(25, seed=1)
    mc, ok = _roundtrip(trace, {})
    assert ok and mc.num_accesses > 0


def test_honest_roundtrip_with_initial_image():
    init = {0x2000 + i: (i * 7 + 3) & 0xFF for i in range(48)}
    trace = _sim(20, seed=2, init=init)
    _mc, ok = _roundtrip(trace, init)
    assert ok


def test_empty_access_stream():
    trace = _FakeTrace([None, None])
    mc, ok = _roundtrip(trace, {})
    assert ok and mc.num_accesses == 0 and mc.touched == []


def test_unaligned_and_subword():
    """Overlapping byte/halfword/word stores at unaligned addresses."""
    accesses = [
        _st(0x3001, 0xAABBCCDD, 2),          # word at unaligned 0x3001
        _ld(0x3002, 0xBB, 0),                # byte from the middle
        _st(0x3003, 0x11, 0),                # overwrite top byte
        _ld(0x3001, 0x11BBCCDD & 0xFFFFFFFF, 2),
        None,
    ]
    _mc, ok = _roundtrip(_FakeTrace(accesses), {})
    assert ok


def test_forged_load_value_rejected():
    """A load that doesn't return the last-stored byte: the honest prover
    refuses; skipping self-checks, verification fails."""
    accesses = [_st(0x4000, 0x55, 0), _ld(0x4000, 0x77, 0)]
    init_mem = {}
    access = extract_byte_accesses(_FakeTrace(accesses), init_mem)
    # extraction replays memory, so forge the committed column instead
    def forge(cols):
        cols["vr"] = cols["vr"].copy()
        cols["vr"][1] = 0x77

    with pytest.raises(AssertionError, match="memcheck violated"):
        prove_memcheck(F, FiatShamirTranscript(), access, init_mem,
                       _forge_hook=forge)
    mc = prove_memcheck(F, FiatShamirTranscript(), access, init_mem,
                        _forge_hook=forge, _unsafe_skip_self_checks=True)
    assert not verify_memcheck(F, FiatShamirTranscript(), mc, 2, init_mem)


def test_forged_final_memory_rejected():
    trace = _sim(12, seed=5)
    init_mem = {}
    access = extract_byte_accesses(trace, init_mem)
    mc = prove_memcheck(F, FiatShamirTranscript(), access, init_mem)
    n = len(trace.memory_accesses)
    assert verify_memcheck(F, FiatShamirTranscript(), mc, n, init_mem)
    a, fv, fts = mc.touched[0]
    mc.touched[0] = (a, (fv + 1) % 256, fts)
    assert not verify_memcheck(F, FiatShamirTranscript(), mc, n, init_mem)


def test_wrong_initial_image_rejected():
    """Verifier with a different public program image must reject."""
    init = {0x2000 + i: 9 for i in range(8)}
    trace = _sim(10, seed=7, init=init)
    access = extract_byte_accesses(trace, init)
    mc = prove_memcheck(F, FiatShamirTranscript(), access, init)
    n = len(trace.memory_accesses)
    assert verify_memcheck(F, FiatShamirTranscript(), mc, n, init)
    other = dict(init)
    other[0x2000] = 10
    # only meaningful if address 0x2000 was actually touched
    if any(a == 0x2000 for a, _v, _t in mc.touched):
        assert not verify_memcheck(F, FiatShamirTranscript(), mc, n, other)


def test_load_row_cannot_mutate_memory():
    """A load row committing vw != vr (a disguised store) violates the
    (1-st)(vw-vr) constraint even when the multiset stays balanced."""
    accesses = [_ld(0x5000, 0, 0), _ld(0x5000, 0x42, 0)]
    init_mem = {}
    access = extract_byte_accesses(_FakeTrace(accesses), init_mem)

    def forge(cols):
        # first load "writes" 0x42 so the second honestly reads it;
        # rebalance the final state claim accordingly below
        cols["vw"] = cols["vw"].copy()
        cols["vw"][0] = 0x42
        cols["vr"] = cols["vr"].copy()
        cols["vr"][1] = 0x42

    mc = prove_memcheck(F, FiatShamirTranscript(), access, init_mem,
                        _forge_hook=forge, _unsafe_skip_self_checks=True)
    mc.touched = [(0x5000, 0x42, 2)]
    assert not verify_memcheck(F, FiatShamirTranscript(), mc, 2, init_mem)


def test_future_read_timestamp_rejected():
    accesses = [_st(0x6000, 1, 0), _ld(0x6000, 1, 0)]
    init_mem = {}
    access = extract_byte_accesses(_FakeTrace(accesses), init_mem)

    def forge(cols):
        cols["rt"] = cols["rt"].copy()
        cols["rt"][1] = 2  # claims to read at its own write slot
        cols["tl0"] = cols["tl0"].copy()
        cols["tl0"][1] = 2

    mc = prove_memcheck(F, FiatShamirTranscript(), access, init_mem,
                        _forge_hook=forge, _unsafe_skip_self_checks=True)
    assert not verify_memcheck(F, FiatShamirTranscript(), mc, 2, init_mem)


def test_unsorted_touched_rejected():
    trace = _sim(10, seed=11)
    access = extract_byte_accesses(trace, {})
    mc = prove_memcheck(F, FiatShamirTranscript(), access, {})
    n = len(trace.memory_accesses)
    if len(mc.touched) >= 2:
        mc.touched[0], mc.touched[1] = mc.touched[1], mc.touched[0]
        assert not verify_memcheck(F, FiatShamirTranscript(), mc, n, {})


def test_tampered_roots_and_sums_rejected():
    trace = _sim(8, seed=13)
    n = len(trace.memory_accesses)
    access = extract_byte_accesses(trace, {})
    mc = prove_memcheck(F, FiatShamirTranscript(), access, {})
    mc.root_cols = bytes(32)
    assert not verify_memcheck(F, FiatShamirTranscript(), mc, n, {})

    mc = prove_memcheck(F, FiatShamirTranscript(), access, {})
    mc.g_sums["g_r"] = (mc.g_sums["g_r"] + 1) % P
    assert not verify_memcheck(F, FiatShamirTranscript(), mc, n, {})

    mc = prove_memcheck(F, FiatShamirTranscript(), access, {})
    mc.zc.column_evals["vr"] = (mc.zc.column_evals["vr"] + 1) % P
    assert not verify_memcheck(F, FiatShamirTranscript(), mc, n, {})


def test_extract_byte_accesses_replay():
    """Hand-checked: store word, byte-load from middle, overwrite, load."""
    accesses = [_st(0x100, 0x0403_0201, 2), _ld(0x102, 0x03, 0),
                _st(0x102, 0xFF, 0), _ld(0x100, 0x04FF_0201 & 0xFFFFFFFF, 2)]
    a = extract_byte_accesses(_FakeTrace(accesses), {})
    assert a.addr.tolist() == [0x100, 0x101, 0x102, 0x103, 0x102, 0x102,
                               0x100, 0x101, 0x102, 0x103]
    assert a.vw.tolist() == [1, 2, 3, 4, 3, 0xFF, 1, 2, 0xFF, 4]
    assert a.vr.tolist() == [0, 0, 0, 0, 3, 3, 1, 2, 0xFF, 4]
    assert a.st.tolist() == [1, 1, 1, 1, 0, 1, 0, 0, 0, 0]
    assert a.read_ts.tolist() == [0, 0, 0, 0, 3, 5, 1, 2, 6, 4]
    assert a.touched == [
        (0x100, 1, 7), (0x101, 2, 8), (0x102, 0xFF, 9), (0x103, 4, 10)
    ]


def test_initial_memory_map_raw_and_elf():
    raw = bytes([1, 2, 3])
    m = initial_memory_map(raw, 0x1000)
    assert m == {0x1000: 1, 0x1001: 2, 0x1002: 3}

    from zigz_tpu import elf
    from zigz_tpu.guest.programs import fibonacci_guest

    guest = fibonacci_guest()
    m2 = initial_memory_map(guest, 0)
    segs = elf.load(guest).segments
    expect = {}
    for seg in segs:
        for i, b in enumerate(seg.data):
            expect[seg.vaddr + i] = b
    assert m2 == expect
