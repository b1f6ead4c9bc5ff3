"""Mesh-sharded batch-evaluation sumcheck rounds (SPMD over the hypercube).

Device/mesh twin of the round loop of :func:`zigz_tpu.proofs.batch_eval.
prove_batch_eval` (SURVEY §2.11 row 3: the claim-reduction collective).
The host prover keeps each claim group's tables at their native width and
tracks zero-padding with a scalar ``(1-r)^2`` scale; here every group's
``F`` and ``w`` tables are ZERO-PADDED to the full ``2^v_max`` domain —
mathematically identical (the padded multilinear extension of a short
column is ``prod(1-x_j) * f~``, and the weight pads the same way, which
is exactly the host path's ``(1-t)^2`` inactive-group term), so the
emitted round evaluations are the same field elements and the proof
bytes are unchanged (tests/test_batch_eval.py::test_mesh_rounds_*).

Per round ONE jitted dispatch folds by the previous challenge and
computes the degree-2 sums g(0), g(2) (g(1) = claim - g(0), the standard
identity the native C++ path also uses); under a
``jax.sharding.NamedSharding`` over the trailing hypercube axis the SPMD
partitioner turns the sums into psums and the MSB fold's cross-shard
pairing into a collective-permute — the same collective shapes as the
distributed sumcheck (parallel/dist.py).  The tail rounds (width at or
below ``host_tail``) finish on host numpy.
"""

from __future__ import annotations

from typing import Dict, List

import numpy as np

from ..core.ext4 import Ext4, challenge_ext, ext_from_ints

__all__ = ["mesh_rounds_ok", "prove_rounds_mesh"]

P = 2013265921


def mesh_rounds_ok(mesh, v_max: int) -> bool:
    if mesh is None:
        return False
    d = int(np.prod(mesh.devices.shape))
    return d > 1 and (1 << v_max) >= 4 * d


_STEP_FNS: Dict[tuple, object] = {}
_ROUND0_FNS: Dict[tuple, object] = {}


def _ext_prod_sums(planes):
    """g(0), g(2) of sum_g F_g * w_g over a (G, 2, 4, w) mont stack:
    returns (2, 4) mont coordinate sums."""
    import jax.numpy as jnp

    from .babybear import add_mod, sub_mod
    from .ext4_dev import _schoolbook
    from .mle import sum_mod

    half = planes.shape[-1] // 2
    lo = planes[..., :half]
    hi = planes[..., half:]

    out = []
    for t in (0, 2):
        if t == 0:
            Ft, Wt = lo[:, 0], lo[:, 1]
        else:
            Ft = add_mod(hi[:, 0], sub_mod(hi[:, 0], lo[:, 0]))
            Wt = add_mod(hi[:, 1], sub_mod(hi[:, 1], lo[:, 1]))
        a = [Ft[:, e] for e in range(4)]
        b = [Wt[:, e] for e in range(4)]
        c = _schoolbook(a, b)  # 4 coords of (G, half)
        out.append(jnp.stack([
            sum_mod(sum_mod(ci, axis=-1), axis=0) for ci in c
        ]))
    return jnp.stack(out)  # (2, 4)


def _sharded(mesh, arr):
    """Shard the trailing (hypercube) axis; make_array_from_callback so
    multi-process global meshes work (each process materializes only its
    addressable shards of the replicated host array)."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as PS

    axis = mesh.axis_names[0]
    spec = [None] * (arr.ndim - 1) + [axis]
    sharding = NamedSharding(mesh, PS(*spec))
    return jax.make_array_from_callback(arr.shape, sharding,
                                        lambda idx: arr[idx])


def _replicated_sharding(mesh):
    from jax.sharding import NamedSharding, PartitionSpec as PS

    return NamedSharding(mesh, PS())


def _round0_fn(mesh, shape):
    key = (id(mesh), shape)
    fn = _ROUND0_FNS.get(key)
    if fn is None:
        import jax

        # planes are ALREADY Montgomery (converted once in
        # _mont_prep_once) — round 0 only computes the sums.  Replicated
        # output so the host can read it on multi-process meshes.
        fn = _ROUND0_FNS[key] = jax.jit(
            _ext_prod_sums, out_shardings=_replicated_sharding(mesh)
        )
    return fn


def _step_fn(mesh, shape):
    """(planes mont (G,2,4,w), r4 mont (4,)) -> (folded (G,2,4,w/2), sums)."""
    key = (id(mesh), shape)
    fn = _STEP_FNS.get(key)
    if fn is None:
        import jax
        from jax.sharding import NamedSharding, PartitionSpec as PS

        from .ext4_dev import ext_fold_dev

        axis = mesh.axis_names[0]

        def batch_eval_mesh_step(planes, r4):
            g, two, four, w = planes.shape
            flat = planes.reshape(g * two, four, w)
            folded = jax.vmap(ext_fold_dev, in_axes=(0, None))(flat, r4)
            folded = folded.reshape(g, two, four, w // 2)
            return folded, _ext_prod_sums(folded)

        fn = _STEP_FNS[key] = jax.jit(
            batch_eval_mesh_step,
            out_shardings=(
                NamedSharding(mesh, PS(None, None, None, axis)),
                _replicated_sharding(mesh),
            ),
        )
    return fn


def _mont_prep_once(planes_u32, mesh):
    import jax

    from .babybear import to_mont

    return jax.jit(to_mont)(_sharded(mesh, planes_u32))


def _download_fn(mesh, shape):
    key = (id(mesh), shape, "dl")
    fn = _STEP_FNS.get(key)
    if fn is None:
        import jax

        # Identity with replicated output: gathers the folded planes so
        # the host tail can read them on multi-process meshes.
        fn = _STEP_FNS[key] = jax.jit(
            lambda x: x, out_shardings=_replicated_sharding(mesh)
        )
    return fn


def prove_rounds_mesh(glist: List[dict], v_max: int, combined_claim: Ext4,
                      transcript, mesh, host_tail: int = None):
    """Run the batch-eval round loop under ``mesh``.  ``glist`` is the
    prover's materialized group list ({"v", "F", "w"}); returns
    (round_evals, rs, claim_running) with transcript absorbs identical to
    the host loop."""
    import jax

    from ..proofs.zerocheck import _interp_eval_ext, absorb_ext
    from .babybear import np_to_mont
    from .ext4_dev import ext_from_device

    p = P
    d = int(np.prod(mesh.devices.shape))
    if host_tail is None:
        host_tail = max(4 * d, 256)
    W = 1 << v_max
    G = len(glist)
    stacked = np.zeros((G, 2, 4, W), dtype=np.uint32)
    for gi, g in enumerate(glist):
        w_g = 1 << g["v"]
        stacked[gi, 0, :, :w_g] = g["F"].c
        stacked[gi, 1, :, :w_g] = g["w"].c

    planes = _mont_prep_once(stacked, mesh)

    round_evals: List[List[Ext4]] = []
    rs: List[Ext4] = []
    claim_running = combined_claim

    def emit(sums_np):
        nonlocal claim_running
        g0 = ext_from_ints([int(x) for x in sums_np[0]])
        g2 = ext_from_ints([int(x) for x in sums_np[1]])
        evals = [g0, claim_running - g0, g2]
        round_evals.append(evals)
        for e in evals:
            absorb_ext(transcript, e)
        r = challenge_ext(transcript)
        rs.append(r)
        claim_running = _interp_eval_ext(evals, r, p)
        return r

    sums = _round0_fn(mesh, planes.shape)(planes)
    r = emit(ext_from_device(sums))
    width = W
    rnd = 1
    while rnd < v_max and width // 2 > host_tail:
        width //= 2
        r4 = np_to_mont(np.asarray(r.to_ints(), dtype=np.uint64))
        planes, sums = _step_fn(mesh, planes.shape)(planes, r4)
        r = emit(ext_from_device(sums))
        rnd += 1

    # Host tail: download (replicated gather), fold by the pending r,
    # finish in numpy on the padded per-group Ext4 tables (same values
    # as the device rounds).
    arr = ext_from_device(_download_fn(mesh, planes.shape)(planes))
    tabs = [(Ext4(arr[gi, 0]), Ext4(arr[gi, 1])) for gi in range(G)]
    while rnd < v_max:
        tabs = [(_fold_host(F, r), _fold_host(w, r)) for F, w in tabs]
        g0 = _prod_sum_host(tabs, 0)
        g2 = _prod_sum_host(tabs, 2)
        evals = [g0, claim_running - g0, g2]
        round_evals.append(evals)
        for e in evals:
            absorb_ext(transcript, e)
        r = challenge_ext(transcript)
        rs.append(r)
        claim_running = _interp_eval_ext(evals, r, p)
        rnd += 1
    return round_evals, rs, claim_running


def _fold_host(tab: Ext4, r: Ext4) -> Ext4:
    half = tab.shape[-1] // 2
    return (1 - r) * tab[..., :half] + r * tab[..., half:]


def _at_t_host(tab: Ext4, t: int) -> Ext4:
    half = tab.shape[-1] // 2
    lo = tab[..., :half]
    hi = tab[..., half:]
    if t == 0:
        return lo
    return (1 - t) * lo + t * hi


def _prod_sum_host(tabs, t: int) -> Ext4:
    from ..core.ext4 import ext_zeros

    total = ext_zeros()
    for F, w in tabs:
        total = total + (_at_t_host(F, t) * _at_t_host(w, t)).sum()
    return total
