"""Grain-LFSR parameter generation for Poseidon/Poseidon2 (standard
procedure, offline-reproducible).

The reference pins hash-zig v2.0.0 for Poseidon2 (build.zig.zon:8-11,
intent at src/core/hash.zig:47-49) but never completes the integration.
Round-2/3 of this build shipped a self-derived SHA3-seeded constant set;
this module replaces it with constants produced by THE published
generation procedure — the 80-bit Grain LFSR of the Poseidon reference
implementation (`generate_parameters_grain.sage`, Grassi-Khovratovich-
Rechberger-Roy-Schofnegger, also used verbatim by the Poseidon2 reference
implementation's `poseidon2_rust_params.sage`):

* state: 80 bits initialized from the parameter description
  (2-bit field tag | 4-bit s-box tag | 12-bit field size n | 12-bit t |
  10-bit R_F | 10-bit R_P | 30 ones), each field big-endian;
* update: b_{i+80} = b_{i+62} ^ b_{i+51} ^ b_{i+38} ^ b_{i+23}
  ^ b_{i+13} ^ b_i, with 160 initial outputs discarded;
* self-shrinking output: consume bit pairs (x, y), emit y iff x = 1;
* prime-field constants: n bits big-endian, rejection-sampled to < p.

The LFSR implementation is validated against the publicly documented
first BN254 Poseidon constant for (n=254, t=3, R_F=8, R_P=57)
(tests/test_poseidon2.py) — the classic cross-implementation KAT — so
the BabyBear stream below is the standard one by construction.

Offline caveat, stated plainly: this environment has no network access,
so the literal Plonky3/HorizenLabs BabyBear tables could not be vendored
for a direct diff.  What is standard here is the CONSTANT STREAM (Grain
over the documented parameter encoding); the partitioning into external/
internal constants follows the Poseidon2 paper (t-wide constants for the
R_F external rounds, one constant per internal round, consumed in round
order), and the internal diagonal is drawn from the continuation of the
same stream (distinct, nonzero, and I + diag(mu) invertible enforced by
construction).  To adopt a vendored table set verbatim, paste it over
`babybear_t16_constants()`'s return value — the permutation code
(core/poseidon2.py) is table-agnostic.
"""

from __future__ import annotations

from typing import List, Tuple

__all__ = ["GrainLFSR", "grain_field_constants", "babybear_t16_constants"]


class GrainLFSR:
    """The Poseidon reference implementation's parameter-derivation LFSR."""

    def __init__(self, field_tag: int, sbox_tag: int, n: int, t: int,
                 r_f: int, r_p: int):
        bits: List[int] = []

        def push(value: int, width: int):
            for i in range(width - 1, -1, -1):
                bits.append((value >> i) & 1)

        push(field_tag, 2)
        push(sbox_tag, 4)
        push(n, 12)
        push(t, 12)
        push(r_f, 10)
        push(r_p, 10)
        bits.extend([1] * 30)
        assert len(bits) == 80
        self.state = bits
        # Warm-up: 160 update rounds, outputs discarded.
        for _ in range(160):
            self._next_raw()

    def _next_raw(self) -> int:
        s = self.state
        new = s[62] ^ s[51] ^ s[38] ^ s[23] ^ s[13] ^ s[0]
        s.pop(0)
        s.append(new)
        return new

    def next_bit(self) -> int:
        """Self-shrinking: emit y of the next (x, y) pair with x = 1."""
        while True:
            x = self._next_raw()
            y = self._next_raw()
            if x == 1:
                return y

    def next_field_element(self, n_bits: int, p: int) -> int:
        """n_bits big-endian, rejection-sampled into [0, p)."""
        while True:
            v = 0
            for _ in range(n_bits):
                v = (v << 1) | self.next_bit()
            if v < p:
                return v


def grain_field_constants(p: int, n_bits: int, t: int, r_f: int, r_p: int,
                          count: int) -> List[int]:
    """First ``count`` prime-field constants of the Grain stream for the
    given Poseidon parameter description (field tag 1, s-box tag 0 =
    x^alpha — the tags used for every prime-field alpha instance)."""
    g = GrainLFSR(1, 0, n_bits, t, r_f, r_p)
    return [g.next_field_element(n_bits, p) for _ in range(count)]


def babybear_t16_constants() -> Tuple[List[List[int]], List[int], List[int]]:
    """(external_rcs [R_F][16], internal_rcs [R_P], internal_diag [16])
    for Poseidon2 over BabyBear, t=16, alpha=7, R_F=8, R_P=13.

    One Grain stream (n=31 bits) in round order: 4 initial external
    t-vectors, R_P internal singles, 4 final external t-vectors, then the
    internal diagonal (resampled while zero / colliding / singular)."""
    p = 2013265921
    t, r_f, r_p = 16, 8, 13
    g = GrainLFSR(1, 0, 31, t, r_f, r_p)

    def take(k: int) -> List[int]:
        return [g.next_field_element(31, p) for _ in range(k)]

    ext: List[List[int]] = [take(t) for _ in range(r_f // 2)]
    internal = take(r_p)
    ext += [take(t) for _ in range(r_f // 2)]

    # Internal diagonal mu: I + diag(mu) must be invertible (mu_i != -1)
    # and the entries distinct and nonzero (Poseidon2 paper §5.2's
    # requirements for the internal matrix to be secure are checked by
    # its authors' tooling; here we enforce the structural conditions and
    # draw from the same standard stream).
    diag: List[int] = []
    seen = set()
    while len(diag) < t:
        v = g.next_field_element(31, p)
        if v == 0 or v == p - 1 or v in seen:
            continue
        seen.add(v)
        diag.append(v)
    return ext, internal, diag
