"""Device-resident Ligero commits (ops/ligero_dev.py) must be bit-exact
drop-ins for the host path: same root, digests, levels, eval-argument
transcript, and v4 proof bytes.  On the CPU test backend the Pallas
column hasher is unavailable and the module falls back to host hashing
of the device-encoded matrix, so these tests pin the four-step NTT, the
state plumbing, and the device vecmat/eval reductions."""

import os

import jax.numpy as jnp
import numpy as np

from zigz_tpu.commitments.ligero import (
    LigeroClaim,
    ligero_column_evals,
    ligero_commit,
    ligero_prove_claims,
    ligero_prove_eval,
    ligero_verify_eval,
    _row_col_weights,
)
from zigz_tpu.core.field import BabyBear as F
from zigz_tpu.core.hash import FiatShamirTranscript
from zigz_tpu.ops.ligero_dev import ligero_commit_device

P = F.MODULUS
rng = np.random.default_rng(5)


def _states(v=10, B=4):
    cols = {f"c{k}": rng.integers(0, P, size=1 << v, dtype=np.uint64)
            for k in range(B)}
    host = ligero_commit(F, cols, "sha3")
    names = sorted(cols)
    rows = jnp.asarray(np.stack([cols[n].astype(np.uint32) for n in names]))
    dev = ligero_commit_device(F, names, rows, "sha3")
    return cols, host, dev


def test_commit_state_matches_host():
    _, host, dev = _states()
    assert dev.root == host.root
    assert dev.leaf_digests == host.leaf_digests
    assert dev.levels == host.levels
    assert (dev.cn, dev.m, dev.n, dev.n_e) == (host.cn, host.m, host.n, host.n_e)
    assert np.array_equal(np.asarray(dev.matrix, dtype=np.uint64), host.matrix)


def test_eval_argument_matches_host_and_verifies():
    cols, host, dev = _states()
    rs = [int(rng.integers(1, P)) for _ in range(host.num_vars)]

    th = FiatShamirTranscript()
    th.append_bytes(b"ligero-dev")
    td = FiatShamirTranscript()
    td.append_bytes(b"ligero-dev")
    ph = ligero_prove_eval(host, rs, th)
    pd = ligero_prove_eval(dev, rs, td)
    assert all(np.array_equal(a, b) for a, b in zip(ph.us, pd.us))
    assert all(np.array_equal(a, b) for a, b in zip(ph.ws, pd.ws))
    assert np.array_equal(ph.columns, pd.columns)
    assert th.challenge_value(P) == td.challenge_value(P)

    evals_h = ligero_column_evals(host, rs)
    evals_d = ligero_column_evals(dev, rs)
    assert evals_h == evals_d

    tv = FiatShamirTranscript()
    tv.append_bytes(b"ligero-dev")
    assert ligero_verify_eval(
        F, dev.root, dev.num_vars, dev.names, evals_d, rs, pd, tv, "sha3"
    )


def test_multi_claim_sum_query_matches_host():
    cols, host, dev = _states(v=8, B=2)
    rs = [int(rng.integers(1, P)) for _ in range(host.num_vars)]
    a, b = _row_col_weights(rs, host.cn)
    ones_a = np.ones(host.m, dtype=np.uint64)
    ones_b = np.ones(host.n, dtype=np.uint64)
    claims = [LigeroClaim(a=a, b=b, values={}),
              LigeroClaim(a=ones_a, b=ones_b, values={})]
    th = FiatShamirTranscript()
    td = FiatShamirTranscript()
    ph = ligero_prove_claims(host, claims, th)
    pd = ligero_prove_claims(dev, claims, td)
    assert all(np.array_equal(x, y) for x, y in zip(ph.us, pd.us))
    assert np.array_equal(ph.columns, pd.columns)
    assert th.challenge_value(P) == td.challenge_value(P)


def test_v4_prove_device_path_byte_identical():
    from zigz_tpu.prover.prover import Prover
    from zigz_tpu.prover.serialization import BinarySerializer
    from zigz_tpu.verifier.verifier import Verifier

    program = (
        bytes([0x93, 0x00, 0x30, 0x00, 0x13, 0x01, 0x40, 0x00])
        + bytes([0xB3, 0x81, 0x20, 0x00]) * 13
        + bytes([0x73, 0x00, 0x10, 0x00])
    )
    ser = BinarySerializer(F)
    prev = os.environ.get("ZIGZ_TPU_COMMITMENTS")
    try:
        os.environ["ZIGZ_TPU_COMMITMENTS"] = "host"
        host_bytes = ser.serialize(
            Prover(F, seed=0, protocol_version=4).prove(program, 0x1000, None, 1 << 8, None, None)
        )
        os.environ["ZIGZ_TPU_COMMITMENTS"] = "device"
        proof = Prover(F, seed=0, protocol_version=4).prove(program, 0x1000, None, 1 << 8, None, None)
        dev_bytes = ser.serialize(proof)
    finally:
        if prev is None:
            os.environ.pop("ZIGZ_TPU_COMMITMENTS", None)
        else:
            os.environ["ZIGZ_TPU_COMMITMENTS"] = prev
    assert dev_bytes == host_bytes
    assert Verifier(F).verify(proof, program) == "Accept"
