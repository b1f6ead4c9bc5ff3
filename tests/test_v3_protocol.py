"""Protocol v3 (Poseidon2 Merkle commitments): end-to-end accept,
roundtrip, host/device/sharded byte-equality, tamper rejection, and
device-kernel parity with the host batch hashers."""

import numpy as np
import pytest

from zigz_tpu.core.field import BabyBear as F
from zigz_tpu.core import poseidon2 as p2h
from zigz_tpu.prover.prover import Prover
from zigz_tpu.prover.serialization import BinarySerializer
from zigz_tpu.verifier.verifier import Verifier

rng = np.random.default_rng(41)


def _program(n_adds=60):
    body = bytes([0x93, 0x00, 0x30, 0x00, 0x13, 0x01, 0x40, 0x00])
    body += bytes([0xB3, 0x81, 0x20, 0x00]) * n_adds
    return body + bytes([0x73, 0x00, 0x10, 0x00])


def _prove(program, **kw):
    return Prover(F, seed=0, protocol_version=3, **kw).prove(
        program, 0x1000, None, 1 << 10, None, None
    )


def test_np_batch_hashers_match_scalar():
    vals = rng.integers(0, F.MODULUS, size=5, dtype=np.uint64)
    blob = p2h.np_batch_leaf_hashes(vals)
    for i, v in enumerate(vals):
        assert blob[i * 32 : (i + 1) * 32] == p2h.hash_field_values([int(v)])
    merged = p2h.np_batch_merge_hashes(blob[:128])
    assert merged[:32] == p2h.hash_two_digests(blob[:32], blob[32:64])
    assert merged[32:] == p2h.hash_two_digests(blob[64:96], blob[96:128])


def test_device_forest_poseidon2_matches_host_tree(monkeypatch):
    from zigz_tpu.commitments.device_forest import DeviceMerkleForest
    from zigz_tpu.commitments.merkle import SimpleMerkleTree

    matrix = rng.integers(0, F.MODULUS, size=(3, 64), dtype=np.uint64)
    forest = DeviceMerkleForest(F, matrix, hash_mode="poseidon2")
    roots = forest.roots()
    idx = np.array([5, 0, 63])
    opens = forest.open_all(idx)
    for i in range(3):
        tree = SimpleMerkleTree.build(F, matrix[i], "poseidon2")
        assert roots[i] == tree.get_root()
        honest = tree.open(int(idx[i]))
        assert opens[i].path.siblings == honest.path.siblings
        assert opens[i].value.value == honest.value.value
        assert SimpleMerkleTree.verify_at_index(
            F, roots[i], opens[i], 6, hasher=p2h.Poseidon2Hasher
        )


def test_v3_end_to_end_accept_and_roundtrip():
    program = _program()
    proof = _prove(program)
    assert proof.metadata.version == 3
    assert Verifier(F).verify(proof, program) == "Accept"
    ser = BinarySerializer(F)
    blob = ser.serialize(proof)
    restored = ser.deserialize(blob)
    assert restored.metadata.version == 3
    assert Verifier(F).verify(restored, program) == "Accept"
    assert ser.serialize(restored) == blob


def test_v3_device_and_sharded_byte_identical(monkeypatch):
    from zigz_tpu.parallel.dist import make_trace_mesh

    program = _program()
    ser = BinarySerializer(F)
    monkeypatch.setenv("ZIGZ_TPU_COMMITMENTS", "host")
    host_bytes = ser.serialize(_prove(program))
    monkeypatch.setenv("ZIGZ_TPU_COMMITMENTS", "device")
    dev_bytes = ser.serialize(_prove(program))
    monkeypatch.delenv("ZIGZ_TPU_COMMITMENTS")
    mesh_bytes = ser.serialize(_prove(program, mesh=make_trace_mesh(8)))
    assert host_bytes == dev_bytes == mesh_bytes


def test_v3_rejects_sha3_commitments():
    # A v2 proof relabeled as v3 must fail (different hasher).
    program = _program()
    proof = Prover(F, seed=0, protocol_version=2).prove(program, 0x1000, None, 1 << 10, None, None)
    proof.metadata.version = 3
    assert Verifier(F).verify(proof, program) != "Accept"


def test_v3_rejects_tampered_opening():
    program = _program()
    proof = _prove(program)
    sib = proof.witness_commitments[7].proof.merkle_proof.path.siblings
    sib[0] = bytes(32)
    assert Verifier(F).verify(proof, program) == "RejectInvalidCommitment"


def test_v3_requires_babybear():
    from zigz_tpu.core.field import Goldilocks

    with pytest.raises(ValueError, match="BabyBear"):
        Prover(Goldilocks, protocol_version=3)
