"""Device-built logUp advice columns for the unified v2 commitment.

The v2 advice phase's dominant cost on a tunneled chip is not computing
the BabyBear^4 inverse columns — it is UPLOADING them: extension inverses
are high-entropy, so the ~45 MB (2^16 steps) / ~700 MB (2^20) of advice
data rides the host->device link at its incompressible ~30 MB/s floor.
This module rebuilds the advice columns ON DEVICE from the already-
resident data-commit matrix plus the (host-resolved) challenges, so the
advice Ligero commitment consumes device arrays and uploads nothing.

Division of labor (prover/unified.py):

* the HOST advice builder stays authoritative: it resolves the nonce,
  absorbs the per-column sums into the transcript, and its numpy/C++
  columns keep feeding the host zerocheck + batch-eval paths;
* the DEVICE twin here rebuilds the same columns purely for the
  commitment.  Every operation is exact mod-p Montgomery arithmetic and
  field inversion is a unique function, so the device columns are
  bit-equal to the host's (asserted in tests/test_advice_dev.py); a
  mismatch would surface loudly as a self-rejecting proof, never as a
  silently wrong one.

Builders return {committed-column-name: flat canonical-u32 device array}
and are keyed/cached per static layout so each prove costs ONE dispatch
per argument.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import numpy as np

from ..commitments.ligero import DeviceColumnRef

__all__ = [
    "advice_dev_available",
    "core_logup_advice_dev",
    "regcheck_advice_dev",
]

P = 2013265921


def advice_dev_available() -> bool:
    import os

    pref = os.environ.get("ZIGZ_TPU_ADVICE", "auto")
    if pref == "host":
        return False
    if pref == "device":
        return True
    try:
        import jax

        return jax.default_backend() == "tpu"
    except Exception:
        return False


# -- in-jit helpers ----------------------------------------------------------

def _resolve(mats, ref: DeviceColumnRef):
    """Materialize a committed column inside a jit from its parent matrix
    (static slice bounds)."""
    flat = mats[ref._mi][ref.off : ref.off + ref.rows].reshape(-1)
    return flat[: ref.length]


def _prep_refs(refs: List[DeviceColumnRef]):
    """Assign a parent-matrix index to each ref; returns (matrices, key)."""
    mats = []
    ids: Dict[int, int] = {}
    key = []
    for r in refs:
        mi = ids.get(id(r.mat))
        if mi is None:
            mi = len(mats)
            mats.append(r.mat)
            ids[id(r.mat)] = mi
        r._mi = mi  # transient, static metadata for the jit closure
        key.append((mi, r.off, r.rows, r.length))
    return mats, tuple(key)


def _ext_mont(x) -> np.ndarray:
    from .babybear import np_to_mont

    return np_to_mont(np.asarray(x.to_ints(), dtype=np.uint64))


def _e_bcast(s4, shape):
    import jax.numpy as jnp

    return jnp.stack([jnp.broadcast_to(s4[e], shape) for e in range(4)])


def _e_lift_base(b):
    """Base mont plane -> ext planes (high coords zero)."""
    import jax.numpy as jnp

    z = jnp.zeros_like(b)
    return jnp.stack([b, z, z, z])


def _e_sub_scalar(s4, t4):
    """scalar ext s - ext table t."""
    from .babybear import sub_mod

    return sub_mod(_e_bcast(s4, t4.shape[1:]), t4)


def _coords_canonical(g4):
    """(4, n) mont -> list of 4 canonical u32 planes (still on device)."""
    from .babybear import from_mont

    return [from_mont(g4[e]) for e in range(4)]


# -- core argument: pc-chain logUp g1/g2 -------------------------------------

_CORE_FNS: Dict[tuple, object] = {}


def core_logup_advice_dev(pc_ref, next_pc_ref, num_steps: int, num_vars: int,
                          tau, beta) -> Optional[Dict[str, object]]:
    """Device twin of constraints/v2.build_logup_columns: returns the 8
    committed coordinate planes {"g1#e"/"g2#e"} as canonical u32 device
    arrays (constraints/v2.py:173-193 for the host reference)."""
    import jax

    mats, rkey = _prep_refs([pc_ref, next_pc_ref])
    key = (rkey, num_steps, num_vars)
    fn = _CORE_FNS.get(key)
    if fn is None:
        import jax.numpy as jnp

        from .babybear import mont_mul, to_mont
        from .ext4_dev import ext_inv_dev, ext_mul_base_dev

        n = 1 << num_vars
        pc_r, npc_r = pc_ref, next_pc_ref

        def run(mats, tau_m, beta_m):
            pc = to_mont(_resolve(mats, pc_r))
            npc = to_mont(_resolve(mats, npc_r))
            idx = to_mont(jnp.arange(n, dtype=jnp.uint32) % jnp.uint32(P))
            idx1 = to_mont((jnp.arange(n, dtype=jnp.uint32) + 1) % jnp.uint32(P))
            sel1 = to_mont((jnp.arange(n) <= (num_steps - 2)).astype(jnp.uint32))
            sel2_np = (jnp.arange(n) <= (num_steps - 1)) & (jnp.arange(n) >= 1)
            sel2 = to_mont(sel2_np.astype(jnp.uint32))
            from .babybear import sub_mod

            # fp1 = tau - beta*(idx+1) - next_pc ; fp2 = tau - beta*idx - pc
            b_idx1 = jnp.stack([mont_mul(beta_m[e], idx1) for e in range(4)])
            b_idx = jnp.stack([mont_mul(beta_m[e], idx) for e in range(4)])
            fp1 = sub_mod(_e_sub_scalar(tau_m, b_idx1), _e_lift_base(npc))
            fp2 = sub_mod(_e_sub_scalar(tau_m, b_idx), _e_lift_base(pc))
            g1 = ext_mul_base_dev(ext_inv_dev(fp1), sel1)
            g2 = ext_mul_base_dev(ext_inv_dev(fp2), sel2)
            return _coords_canonical(g1) + _coords_canonical(g2)

        fn = jax.jit(run)
        _CORE_FNS[key] = fn
    out = fn(mats, _ext_mont(tau), _ext_mont(beta))
    names = [f"g1#{e}" for e in range(4)] + [f"g2#{e}" for e in range(4)]
    return dict(zip(names, out))


# -- regcheck: kappa fingerprints + RANGE16 quads + h ------------------------

_RC_FNS: Dict[tuple, object] = {}


def regcheck_advice_dev(refs: Dict[str, DeviceColumnRef], n_active: int,
                        num_vars: int, tau_m, tau_r, gamma,
                        m_ref) -> Optional[Dict[str, object]]:
    """Device twin of RegcheckArgument.advice_phase's column construction
    (constraints/regcheck.py:495-503): the six g_{r,w}{m} fingerprint
    inverses, the merged RANGE16 quads gq_i, and the table-side h column.

    ``refs`` maps regcheck data-column names (a1..a3, rt1..rt3, value
    limbs, tl/dl limbs) to DeviceColumnRef; ``m_ref`` is the RANGE16
    multiplicity column.  Returns {committed coord name: canonical u32
    device array} for g_*#e / gq*#e / h#e."""
    import jax

    from ..constraints.regcheck import _RANGE_GROUPS, _kappa_parts

    assert num_vars <= 28, "ts = 3*idx + m must stay below p in u32"
    names = sorted(refs)
    mats, rkey = _prep_refs([refs[k] for k in names] + [m_ref])
    key = (rkey, tuple(names), n_active, num_vars)
    fn = _RC_FNS.get(key)
    if fn is None:
        import jax.numpy as jnp

        from .babybear import add_mod, mont_mul, sub_mod, to_mont
        from .ext4_dev import (
            ext_add_dev,
            ext_inv_dev,
            ext_mul_base_dev,
            ext_mul_dev,
            ext_scale_dev,
        )

        n = 1 << num_vars
        ref_list = [refs[k] for k in names]
        pos = {k: i for i, k in enumerate(names)}
        m_ref_l = m_ref

        def run(mats, tau_m4, tau_r4, gp_m):
            # gp_m: (6, 4) mont gamma powers 1..gamma^5
            cols = {k: to_mont(_resolve(mats, ref_list[pos[k]]))
                    for k in names}
            idx = jnp.arange(n, dtype=jnp.uint32)
            sel = to_mont((idx <= (n_active - 1)).astype(jnp.uint32))
            out = []
            # g_{side}{m}: 1/(tau_m - kappa) * sel
            for m in (1, 2, 3):
                for side in ("r", "w"):
                    a_name, vpre = _kappa_parts(m, side)
                    if side == "r":
                        ts = cols[f"rt{m}"]
                    else:
                        # 3*idx + m < p needs idx < ~2^29.4 (checked by the
                        # caller's num_vars), so u32 arithmetic is exact and
                        # the mod-p reduction is a no-op.
                        ts = to_mont(3 * idx + jnp.uint32(m))
                    parts = [cols[a_name]] + \
                        [cols[f"{vpre}_{k}"] for k in range(4)] + [ts]
                    # kappa = sum_i gp[i] * parts[i]  (ext scalar x base)
                    acc = None
                    for i, b in enumerate(parts):
                        term = jnp.stack([
                            mont_mul(jnp.broadcast_to(gp_m[i, e], b.shape), b)
                            for e in range(4)
                        ])
                        acc = term if acc is None else ext_add_dev(acc, term)
                    d = sub_mod(_e_bcast(tau_m4, (n,)), acc)
                    g = ext_mul_base_dev(ext_inv_dev(d), sel)
                    out.extend(_coords_canonical(g))
            # Range quads: gq_i = sum_j 1/(tau_r - coef*c_j), via the
            # shared prod/num identity (one inverse per group).
            for group in _RANGE_GROUPS:
                ds = []
                for c, coef in group:
                    scaled = cols[c] if coef == 1 else mont_mul(
                        jnp.broadcast_to(to_mont(jnp.uint32(coef)),
                                         cols[c].shape), cols[c])
                    ds.append(_e_sub_scalar(tau_r4, _e_lift_base(scaled)))
                prod_all, num = _dev_fraction_sum_parts(ds)
                gq = ext_mul_dev(num, ext_inv_dev(prod_all))
                out.extend(_coords_canonical(gq))
            # h = m / (tau_r - idx16) over the RANGE16 domain.
            m_col = to_mont(_resolve(mats, m_ref_l))
            idx16 = to_mont(jnp.arange(1 << 16, dtype=jnp.uint32))
            dh = _e_sub_scalar(tau_r4, _e_lift_base(idx16))
            h = ext_mul_base_dev(ext_inv_dev(dh), m_col)
            out.extend(_coords_canonical(h))
            return out

        fn = jax.jit(run)
        _RC_FNS[key] = fn

    from ..constraints.regcheck import _gamma_powers

    gp = _gamma_powers(gamma)
    gp_m = np.stack([_ext_mont(g) for g in gp])
    out = fn(mats, _ext_mont(tau_m), _ext_mont(tau_r), gp_m)
    out_names = []
    for m in (1, 2, 3):
        for side in ("r", "w"):
            out_names += [f"g_{side}{m}#{e}" for e in range(4)]
    for i in range(len(_RANGE_GROUPS)):
        out_names += [f"gq{i}#{e}" for e in range(4)]
    out_names += [f"h#{e}" for e in range(4)]
    return dict(zip(out_names, out))


def _dev_fraction_sum_parts(ds):
    """Device twin of constraints/regcheck._fraction_sum_parts."""
    from .ext4_dev import ext_add_dev, ext_mul_dev

    k = len(ds)
    if k == 1:
        from .babybear import R_MOD_P
        import jax.numpy as jnp

        one = jnp.full(ds[0].shape[1:], R_MOD_P, jnp.uint32)
        return ds[0], _e_lift_base(one)
    if k == 2:
        return ext_mul_dev(ds[0], ds[1]), ext_add_dev(ds[0], ds[1])
    if k == 3:
        d01 = ext_mul_dev(ds[0], ds[1])
        return (ext_mul_dev(d01, ds[2]),
                ext_add_dev(ext_mul_dev(ext_add_dev(ds[0], ds[1]), ds[2]), d01))
    d01 = ext_mul_dev(ds[0], ds[1])
    d23 = ext_mul_dev(ds[2], ds[3])
    return (ext_mul_dev(d01, d23),
            ext_add_dev(ext_mul_dev(ext_add_dev(ds[0], ds[1]), d23),
                        ext_mul_dev(ext_add_dev(ds[2], ds[3]), d01)))
