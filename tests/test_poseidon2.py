"""Poseidon2-over-BabyBear tests: permutation properties, numpy/host
equivalence, hasher interface."""

import numpy as np

from zigz_tpu.core.field import BabyBear as F
from zigz_tpu.core import poseidon2 as p2

rng = np.random.default_rng(3)


def test_permutation_deterministic_and_nontrivial():
    state = list(range(p2.T))
    out1 = p2.permute(state)
    out2 = p2.permute(state)
    assert out1 == out2
    assert out1 != state
    assert all(0 <= x < p2.P for x in out1)


def test_permutation_bijective_on_samples():
    # Distinct inputs must map to distinct outputs (necessary condition).
    seen = set()
    for i in range(50):
        out = tuple(p2.permute([i] + [0] * (p2.T - 1)))
        assert out not in seen
        seen.add(out)


def test_np_permute_matches_scalar():
    states = rng.integers(0, p2.P, size=(p2.T, 8), dtype=np.uint64)
    vec = p2.np_permute(states.copy())
    for n in range(8):
        scalar = p2.permute([int(states[i, n]) for i in range(p2.T)])
        assert [int(vec[i, n]) for i in range(p2.T)] == scalar


def test_sponge_basic_properties():
    d1 = p2.hash_field_values([1, 2, 3])
    assert len(d1) == 32
    assert d1 == p2.hash_field_values([1, 2, 3])
    assert d1 != p2.hash_field_values([1, 2, 4])
    # Length domain separation: [1,2,3] vs [1,2,3,0] differ.
    assert d1 != p2.hash_field_values([1, 2, 3, 0])


def test_hasher_interface():
    el = F(42)
    leaf = p2.Poseidon2Hasher.hash_leaf(F, el)
    assert leaf == p2.Poseidon2Hasher.hash_leaf_value(42)
    node = p2.Poseidon2Hasher.hash_internal(leaf, leaf)
    assert len(node) == 32
    assert node != p2.Poseidon2Hasher.hash_internal(leaf, p2.Poseidon2Hasher.hash_leaf_value(43))
    # Order matters.
    a, b = p2.Poseidon2Hasher.hash_leaf_value(1), p2.Poseidon2Hasher.hash_leaf_value(2)
    assert p2.Poseidon2Hasher.hash_internal(a, b) != p2.Poseidon2Hasher.hash_internal(b, a)


def test_differs_from_sha3():
    from zigz_tpu.core.hash import SHA3Hasher

    assert p2.Poseidon2Hasher.hash_leaf_value(123) != SHA3Hasher.hash_leaf_value(123)


def test_merkle_tree_with_poseidon2():
    """A Merkle tree over the Poseidon2 hasher (the MerkleTreePoseidon2
    alias surface of the reference, merkle_tree.zig:414-416)."""
    from zigz_tpu.commitments.merkle import MerklePath, OpeningProof

    values = [F(v) for v in range(8)]
    level = [p2.Poseidon2Hasher.hash_leaf(F, v) for v in values]
    while len(level) > 1:
        level = [
            p2.Poseidon2Hasher.hash_internal(level[i], level[i + 1])
            for i in range(0, len(level), 2)
        ]
    root = level[0]
    assert len(root) == 32


# -- device kernel parity ---------------------------------------------------

def test_device_kernel_matches_host():
    """Leaves + merges + full tree in ONE test: every jit shape compiled
    here is reused down the tree chain (XLA CPU compiles of the permutation
    cost ~10s per shape, so the parity checks share one 16-leaf chain)."""
    from zigz_tpu.ops import poseidon2 as p2d

    vals = rng.integers(0, p2.P, size=16, dtype=np.uint64)
    level = p2d.p2_leaves(vals)
    digests = p2d.limbs_to_bytes(level)
    for i, v in enumerate(vals):
        assert digests[i * 32 : (i + 1) * 32] == p2.hash_field_values([int(v)]), i

    host_level = [p2.Poseidon2Hasher.hash_leaf_value(int(v)) for v in vals]
    while level.shape[-1] > 1:
        level = p2d.p2_merge(level)
        host_level = [
            p2.Poseidon2Hasher.hash_internal(host_level[i], host_level[i + 1])
            for i in range(0, len(host_level), 2)
        ]
        got = p2d.limbs_to_bytes(level)
        for i in range(len(host_level)):
            assert got[i * 32 : (i + 1) * 32] == host_level[i], (level.shape, i)


# -- standard Grain-LFSR parameter derivation (round 4) ----------------------

def test_grain_lfsr_bn254_known_answer():
    """The parameter LFSR must reproduce the PUBLISHED first constants of
    the Poseidon reference implementation for BN254 (n=254, t=3, R_F=8,
    R_P=57) — the classic cross-implementation KAT (circomlib /
    generate_parameters_grain.sage).  This pins the 80-bit state encoding,
    the tap positions, the 160-round warm-up, the self-shrinking output
    rule, and the big-endian rejection sampling all at once."""
    from zigz_tpu.core.poseidon2_params import grain_field_constants

    p_bn254 = 21888242871839275222246405745257275088548364400416034343698204186575808495617
    cs = grain_field_constants(p_bn254, 254, 3, 8, 57, 2)
    assert cs[0] == 0x0EE9A592BA9A9518D05986D656F40C2114C4993C11BB29938D21D47304CD8E6E
    assert cs[1] == 0x00F1445235F2148C5986587169FC1BCD887B08D4D00868DF5696FFF40956E864


def test_babybear_tables_shape_and_structure():
    from zigz_tpu.core.poseidon2_params import babybear_t16_constants

    ext, internal, diag = babybear_t16_constants()
    p = 2013265921
    assert len(ext) == 8 and all(len(r) == 16 for r in ext)
    assert len(internal) == 13
    assert len(diag) == 16
    flat = [c for r in ext for c in r] + internal + diag
    assert all(0 <= c < p for c in flat)
    # invertibility of I + diag(mu) and distinct nonzero diagonal
    assert len(set(diag)) == 16
    assert all(d not in (0, p - 1) for d in diag)


def test_babybear_tables_deterministic_pin():
    """Regression pin: the derived BabyBear tables must never drift (a
    silent change would fork the v3 wire format)."""
    from zigz_tpu.core.poseidon2_params import babybear_t16_constants

    ext, internal, diag = babybear_t16_constants()
    import hashlib

    blob = b"".join(
        int(c).to_bytes(4, "little")
        for c in ([x for r in ext for x in r] + internal + diag)
    )
    digest = hashlib.sha256(blob).hexdigest()
    # Pinned at derivation time (round 4); update ONLY with a v3-format
    # bump.  Soft cross-check: the first derived external constant is
    # 0x69CBB6AF (1774958255) — matching the first entry of the Poseidon2
    # reference implementation's published BabyBear RC16 table, as
    # expected for the same Grain stream.
    assert ext[0][0] == 0x69CBB6AF
    assert digest == "f7aad44bbe9014afd2510528eca323fbfe253317769b70b6ba872173a89e7c17"


def test_internal_matrix_no_invariant_subspaces():
    """Round-5 (advisor finding): the Poseidon2 paper's invariant-subspace
    condition on the internal matrix, verified on the SHIPPED matrix
    (extracted from the permutation code): char(M_I) irreducible over F_p
    of degree t => minimal poly = char poly => only trivial invariant
    subspaces (Grassi-Rechberger-Schofnegger, infinitely long subspace
    trails)."""
    from zigz_tpu.core.poseidon2_params import internal_matrix_security_report

    report = internal_matrix_security_report()
    assert report["invertible"]
    assert report["char_poly_irreducible"]
    assert report["no_invariant_subspaces"]


def test_permutation_cleanroom_twin():
    """Round-5 verdict task 8: pin the t=16 BabyBear instance against an
    INDEPENDENT implementation of the Poseidon2 permutation, written
    directly from the paper's definition (dense 16x16 matrices:
    M_E = block-circulant with 2*M4 diagonal / M4 off-diagonal blocks,
    M_I = J + diag(mu); x^7 s-box; 4 external + 13 internal + 4 external
    rounds with an initial external linear layer) — sharing only the
    public parameter tables with core/poseidon2.py, none of its code."""
    from zigz_tpu.core import poseidon2 as p2
    from zigz_tpu.core.poseidon2_params import babybear_t16_constants

    P = 2013265921
    T = 16
    ext_rcs, int_rcs, mu = babybear_t16_constants()

    M4 = [[5, 7, 1, 3], [4, 6, 1, 1], [1, 3, 5, 7], [1, 1, 4, 6]]
    # Dense external matrix: diagonal blocks 2*M4, off-diagonal M4.
    ME = [[0] * T for _ in range(T)]
    for bi in range(4):
        for bj in range(4):
            scale = 2 if bi == bj else 1
            for i in range(4):
                for j in range(4):
                    ME[4 * bi + i][4 * bj + j] = scale * M4[i][j] % P
    # Dense internal matrix: all-ones plus diag(mu).
    MI = [[1] * T for _ in range(T)]
    for i in range(T):
        MI[i][i] = (1 + mu[i]) % P

    def matvec(M, x):
        return [sum(M[i][j] * x[j] for j in range(T)) % P for i in range(T)]

    def sbox(x):
        return pow(x, 7, P)

    def cleanroom_permute(state):
        s = [x % P for x in state]
        s = matvec(ME, s)
        for r in range(4):
            s = [sbox((x + ext_rcs[r][i]) % P) for i, x in enumerate(s)]
            s = matvec(ME, s)
        for r in range(13):
            s = [(s[0] + int_rcs[r]) % P] + s[1:]
            s = [sbox(s[0])] + s[1:]
            s = matvec(MI, s)
        for r in range(4, 8):
            s = [sbox((x + ext_rcs[r][i]) % P) for i, x in enumerate(s)]
            s = matvec(ME, s)
        return s

    import random

    rng = random.Random(7)
    for _ in range(5):
        state = [rng.randrange(P) for _ in range(T)]
        assert cleanroom_permute(state) == p2.permute(state)

    # Frozen golden vector: pins the INSTANCE (tables + structure) so any
    # silent parameter drift fails loudly.
    golden_in = list(range(T))
    golden_out = cleanroom_permute(golden_in)
    assert p2.permute(golden_in) == golden_out
    import hashlib

    blob = b"".join(int(x).to_bytes(4, "little") for x in golden_out)
    assert hashlib.sha256(blob).hexdigest() == GOLDEN_T16_DIGEST


# sha256 of the LE-u32 packed permute(0..15) output; regenerated only on a
# deliberate parameter change.
GOLDEN_T16_DIGEST = "88d17b27277582425a1925daf5b0e32fce1b30e041e5f035104ff1e97afe210d"
