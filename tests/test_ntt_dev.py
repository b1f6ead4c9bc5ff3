"""The four-step device NTT (ops/ntt_dev.py) must be bit-identical to the
host Reed-Solomon row encoder (commitments/ligero.py) — it feeds Ligero
column hashing, so a single differing residue breaks every proof."""

import numpy as np

from zigz_tpu.commitments.ligero import _ntt_pow2_numpy
from zigz_tpu.ops.ntt_dev import encode_rows_device

P = 2013265921
rng = np.random.default_rng(11)


def _check(rows, n, n_out):
    mat = rng.integers(0, P, size=(rows, n), dtype=np.uint64)
    host = _ntt_pow2_numpy(mat, n_out)
    dev = np.asarray(encode_rows_device(mat, n_out), dtype=np.uint64)
    assert np.array_equal(dev, host), (rows, n, n_out)


def test_even_log_size():
    _check(5, 256, 1024)  # v=10 -> 32 x 32 split


def test_odd_log_size():
    _check(3, 128, 512)  # v=9 -> 16 x 32 split


def test_inv_rate_padding():
    # n < n_out exercises the zero-pad path (the Ligero inv_rate=4 shape).
    _check(7, 64, 256)


def test_small_sizes_host_fallback():
    for n_out in (2, 4, 16, 128):
        n = max(1, n_out // 4)
        _check(2, n, n_out)


def test_device_array_input():
    import jax.numpy as jnp

    mat = rng.integers(0, P, size=(4, 256), dtype=np.uint64)
    dev_in = jnp.asarray(mat.astype(np.uint32))
    host = _ntt_pow2_numpy(mat, 1024)
    dev = np.asarray(encode_rows_device(dev_in, 1024), dtype=np.uint64)
    assert np.array_equal(dev, host)


def test_slab_split():
    from zigz_tpu.ops import ntt_dev

    old = ntt_dev._SLAB_ELEMS
    ntt_dev._SLAB_ELEMS = 2 * 1024  # force multiple slabs
    try:
        _check(9, 256, 1024)
    finally:
        ntt_dev._SLAB_ELEMS = old
