"""Transcript + hashing tests (hash.zig:333-456 ports) plus hand-computed
golden vectors that pin the exact byte schedule."""

import hashlib

from zigz_tpu.core.field import BabyBear, F17, Field
from zigz_tpu.core.hash import (
    FiatShamirTranscript,
    SHA3Hasher,
    digest_to_field_element,
    hash_bytes,
    hash_field_element,
    merge_hashes,
)
from zigz_tpu.core.xoshiro import SplitMix64, Xoshiro256

F = Field(17)


def test_basic_digest():
    d = hash_bytes(b"Hello, zigz!")
    assert len(d) == 32
    assert d == hash_bytes(b"Hello, zigz!")
    assert d != hash_bytes(b"Different data")


def test_field_element_hashing():
    a = F(5)
    da = hash_field_element(F, a)
    assert da == hash_field_element(F, a)
    assert da != hash_field_element(F, F(7))
    # Pin the wire format: SHA3-256 over 8 LE bytes of the canonical limb.
    assert da == hashlib.sha3_256((5).to_bytes(8, "little")).digest()


def test_merge_hashes_order_matters():
    left = hash_bytes(b"left")
    right = hash_bytes(b"right")
    parent = merge_hashes(left, right)
    assert parent == merge_hashes(left, right)
    assert parent != merge_hashes(right, left)
    assert parent == hashlib.sha3_256(left + right).digest()


def test_digest_to_field_element():
    digest = hash_bytes(b"test data")
    el = digest_to_field_element(F, digest)
    assert el.value < F.MODULUS
    assert el.eql(digest_to_field_element(F, digest))
    # Pin: first 8 LE bytes reduced mod p (T = u64 for all presets).
    assert el.value == int.from_bytes(digest[:8], "little") % 17


def test_transcript_challenge_semantics():
    t = FiatShamirTranscript()
    t.append_field_element(F, F(5))
    t.append_field_element(F, F(7))
    c1 = t.challenge(F)
    c2 = t.challenge(F)
    # Reference semantics: the digest re-absorb makes successive challenges
    # DIFFER; re-deriving on an identical transcript gives the same value.
    t2 = FiatShamirTranscript()
    t2.append_field_element(F, F(5))
    t2.append_field_element(F, F(7))
    assert c1.eql(t2.challenge(F))
    assert not c1.eql(c2)  # state advanced by the re-absorb

    # Adding more data changes the next challenge.
    t.append_field_element(F, F(10))
    c3 = t.challenge(F)
    assert not c3.eql(c1)


def test_transcript_divergence():
    t1 = FiatShamirTranscript()
    t2 = FiatShamirTranscript()
    t1.append_field_element(F, F(5))
    t1.append_field_element(F, F(7))
    t2.append_field_element(F, F(5))
    t2.append_field_element(F, F(8))
    assert not t1.challenge(F).eql(t2.challenge(F))


def test_transcript_golden_vector():
    """Hand-derived pin of the clone-final-reabsorb discipline."""
    t = FiatShamirTranscript()
    t.append_bytes(b"SUMCHECK_BEGIN")
    t.append_field_element(BabyBear, BabyBear(2))
    h = hashlib.sha3_256(b"SUMCHECK_BEGIN" + (2).to_bytes(8, "little"))
    d = h.digest()
    expected = int.from_bytes(d[:8], "little") % BabyBear.MODULUS
    assert t.challenge(BabyBear).value == expected
    # After the challenge the digest itself is absorbed.
    h.update(d)
    d2 = h.digest()
    assert t.challenge(BabyBear).value == int.from_bytes(d2[:8], "little") % BabyBear.MODULUS


def test_sha3_hasher_interface():
    el = F(42)
    assert len(SHA3Hasher.hash_leaf(F, el)) == 32
    assert SHA3Hasher.name == "SHA3-256"
    assert SHA3Hasher.hash_leaf_value(el.value) == SHA3Hasher.hash_leaf(F, el)


def test_splitmix64_known_values():
    """Known-answer vectors for SplitMix64 with seed 0 (the canonical stream
    used by Zig's Xoshiro256 seeding)."""
    g = SplitMix64(0)
    assert g.next() == 0xE220A8397B1DCDAF
    assert g.next() == 0x6E789E6AA1B965F4
    assert g.next() == 0x06C45D188009454F
    assert g.next() == 0xF88BB8A8724C81EC


def test_xoshiro256pp_stream():
    """xoshiro256++ from a SplitMix64(0)-seeded state — deterministic and
    stable across runs (prover seed=0 stream)."""
    rng = Xoshiro256(0)
    first = [rng.next() for _ in range(4)]
    rng2 = Xoshiro256(0)
    assert [rng2.next() for _ in range(4)] == first
    # Manually compute the first output: rotl(s0+s3, 23) + s0.
    s = [0xE220A8397B1DCDAF, 0x6E789E6AA1B965F4, 0x06C45D188009454F, 0xF88BB8A8724C81EC]
    m = (1 << 64) - 1
    t = (s[0] + s[3]) & m
    rot = ((t << 23) | (t >> 41)) & m
    assert first[0] == (rot + s[0]) & m
    # Different seeds diverge.
    assert Xoshiro256(1).next() != first[0]
