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
    "bytecode_advice_dev",
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
            idx_s = jnp.arange(n, dtype=jnp.int32)
            sel1 = to_mont((idx_s <= (num_steps - 2)).astype(jnp.uint32))
            sel2 = to_mont(((idx_s <= (num_steps - 1)) & (idx_s >= 1))
                           .astype(jnp.uint32))
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
            sel = to_mont((jnp.arange(n, dtype=jnp.int32) <= (n_active - 1))
                          .astype(jnp.uint32))
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


# -- bytecode: fetch/counter/output/linkage/range/mem-link advice ------------

_BC_FNS: Dict[tuple, object] = {}


def bytecode_advice_dev(data_state, bc, num_vars: int) -> Optional[Dict[str, object]]:
    """Device twin of the bulk of _bc_advice_phase's column construction
    (constraints/bytecode.py:1271-1303): g_bc, the counter chains
    g_c1/g_c2/g_b1/g_b2, g_out, the step linkage g_lk_s, the merged
    RANGE16 pairs grp*, the merged per-byte mem-link pairs gmp*, the
    byte-domain g_lnk, and h_r16.  The program-domain h_prog and the
    per-table query-link advice stay host-built (their domains are small
    and/or need the public decode table, not committed columns).

    ``bc`` is the BytecodeArgument AFTER its host advice_phase (challenges
    resolved, powers computed).  Returns {committed local name: canonical
    u32 device array} or None when any required committed column is not
    device-resident."""
    import jax

    from ..constraints.bytecode import (
        BYTECODE_SLOTS,
        GM_GROUPS,
        RANGE_GROUPS,
        _LOAD_FLAGS,
        _STORE_FLAGS,
    )

    (tau, gamma, tau_c, beta_c, tau_o, beta_o, tau_l, delta, tau_r,
     tau_w, eps) = bc.challenges
    from ..constraints.bytecode import _gammas, _out_betas
    from ..constraints.linkage import link_deltas

    gp = _gammas(gamma, P)
    ob = _out_betas(beta_o, P)
    dl = link_deltas(delta, P)
    ep = bc.ep

    # Committed-column refs (cross-namespace: bc's own link columns, the
    # core pc, the regcheck operand limbs, the memcheck byte rows).
    def ref(fn):
        return data_state.device_column(fn)

    names = {}
    for slot in BYTECODE_SLOTS:
        if slot == "pc":
            names["pc"] = "v2:pc"
        elif slot in ("a1", "a2"):
            names[slot] = f"rc:{slot}"
        else:
            names[slot] = f"bc:{slot}"
    for extra in ("cnt", "c_commit", "bcnt", "m_r16",
                  "res_0", "res_1", "res_2", "res_3", "taken_b"):
        names[extra] = f"bc:{extra}"
    for cname, _coef in sum(RANGE_GROUPS, ()):
        names.setdefault(cname, f"bc:{cname}")
    for k in range(4):
        names[f"rv1_{k}"] = f"rc:rv1_{k}"
        names[f"rv2_{k}"] = f"rc:rv2_{k}"
    for mcn in ("ba0", "ba1", "ba2", "ba3", "bk", "vw", "st"):
        names[f"mc_{mcn}"] = f"mc:{mcn}"
    refs = {}
    for local, fn in names.items():
        r = ref(fn)
        if r is None:
            return None
        refs[local] = r

    n_active = bc.n
    A, mvv = bc.A, bc.mvv
    order = sorted(refs)
    mats, rkey = _prep_refs([refs[k] for k in order])
    key = (rkey, tuple(order), n_active, num_vars, A, mvv)
    fn = _BC_FNS.get(key)
    if fn is None:
        import jax.numpy as jnp

        from .babybear import add_mod, mont_mul, sub_mod, to_mont
        from .ext4_dev import (
            ext_add_dev,
            ext_inv_dev,
            ext_mul_base_dev,
            ext_mul_dev,
            ext_sub_dev,
        )

        n = 1 << num_vars
        pos = {k: i for i, k in enumerate(order)}
        ref_list = [refs[k] for k in order]
        n_groups_r = len(RANGE_GROUPS)

        def run(mats, sc):
            # sc: dict of stacked mont scalar tables (see call below).
            cols = {k: to_mont(_resolve(mats, ref_list[pos[k]]))
                    for k in order if not k.startswith("m_r16")}
            m_r16 = to_mont(_resolve(mats, ref_list[pos["m_r16"]]))
            idx = jnp.arange(n, dtype=jnp.uint32)
            # SIGNED comparisons: n_active - 2 may be negative (a uint32
            # compare would wrap to all-true; caught by the g_lnk A=0 case).
            idx_s = jnp.arange(n, dtype=jnp.int32)
            sel = to_mont((idx_s <= (n_active - 1)).astype(jnp.uint32))
            sel1 = to_mont((idx_s <= (n_active - 2)).astype(jnp.uint32))
            sel2 = to_mont(((idx_s <= (n_active - 1)) & (idx_s >= 1)).astype(jnp.uint32))
            idx_m = to_mont(idx)
            idx1_m = to_mont((idx + 1) % jnp.uint32(P))
            out = {}

            def scalar(name, j=None):
                v = sc[name] if j is None else sc[name][j]
                return v

            def e_scale_b(s4, b):
                return jnp.stack([
                    mont_mul(jnp.broadcast_to(s4[e], b.shape), b)
                    for e in range(4)
                ])

            def e_from_scalar(s4, shape):
                return jnp.stack([jnp.broadcast_to(s4[e], shape) for e in range(4)])

            def emit(name, g4):
                for e, plane in enumerate(_coords_canonical(g4)):
                    out[f"{name}#{e}"] = plane

            # g_bc: sel / (tau - kappa_step)
            kap = None
            for i, slot in enumerate(BYTECODE_SLOTS):
                term = e_scale_b(scalar("gp", i), cols[slot])
                kap = term if kap is None else ext_add_dev(kap, term)
            d_bc = ext_sub_dev(e_from_scalar(scalar("tau"), (n,)), kap)
            emit("g_bc", ext_mul_base_dev(ext_inv_dev(d_bc), sel))

            # Counter chains: g_c1/g_c2 over cnt/c_commit, g_b1/g_b2 over
            # bcnt with nb_full = sum of the mem one-hot selectors.
            # beta_c * (idx+1) and beta_c * idx as ext tables:
            bc_idx1 = e_scale_b(scalar("beta_c"), idx1_m)
            bc_idx = e_scale_b(scalar("beta_c"), idx_m)
            tau_c_t = e_from_scalar(scalar("tau_c"), (n,))
            d_c1 = ext_sub_dev(
                ext_sub_dev(ext_sub_dev(tau_c_t, bc_idx1), _e_lift_base(cols["cnt"])),
                _e_lift_base(cols["c_commit"]),
            )
            d_c2 = ext_sub_dev(ext_sub_dev(tau_c_t, bc_idx), _e_lift_base(cols["cnt"]))
            emit("g_c1", ext_mul_base_dev(ext_inv_dev(d_c1), sel1))
            emit("g_c2", ext_mul_base_dev(ext_inv_dev(d_c2), sel2))

            # g_out: c_commit / (tau_o - ob0*cnt - sum ob_{k+1}*rv2_k)
            key_out = e_scale_b(scalar("ob", 0), cols["cnt"])
            for k in range(4):
                key_out = ext_add_dev(key_out, e_scale_b(scalar("ob", k + 1), cols[f"rv2_{k}"]))
            d_out = ext_sub_dev(e_from_scalar(scalar("tau_o"), (n,)), key_out)
            emit("g_out", ext_mul_base_dev(ext_inv_dev(d_out), cols["c_commit"]))

            # g_lk_s: flk / (tau_l - kappa_lk), kappa per _step_link_denoms.
            falu = sub_mod(cols["flk"], cols["fbr"])
            kap_l = e_scale_b(scalar("dl", 0), cols["tbl1"])
            for k in range(4):
                kap_l = ext_add_dev(kap_l, e_scale_b(scalar("dl", 1 + k), cols[f"rv1_{k}"]))
                in1k = add_mod(mont_mul(cols["fimm"], cols[f"imm_{k}"]),
                               mont_mul(cols["frs2"], cols[f"rv2_{k}"]))
                kap_l = ext_add_dev(kap_l, e_scale_b(scalar("dl", 5 + k), in1k))
            s_terms = [
                add_mod(mont_mul(falu, cols["res_0"]), mont_mul(cols["fbr"], cols["f3"])),
                add_mod(mont_mul(falu, cols["res_1"]), mont_mul(cols["fbr"], cols["taken_b"])),
                mont_mul(falu, cols["res_2"]),
                mont_mul(falu, cols["res_3"]),
            ]
            for k in range(4):
                kap_l = ext_add_dev(kap_l, e_scale_b(scalar("dl", 9 + k), s_terms[k]))
            d_lk = ext_sub_dev(e_from_scalar(scalar("tau_l"), (n,)), kap_l)
            emit("g_lk_s", ext_mul_base_dev(ext_inv_dev(d_lk), cols["flk"]))

            # RANGE16 merged pairs over the scaled lk columns.
            tau_r_t = e_from_scalar(scalar("tau_r"), (n,))
            for i, group in enumerate(RANGE_GROUPS):
                ds = []
                for cname, coef in group:
                    scaled = cols[cname] if coef == 1 else mont_mul(
                        jnp.broadcast_to(to_mont(jnp.uint32(coef)), (n,)),
                        cols[cname])
                    ds.append(ext_sub_dev(tau_r_t, _e_lift_base(scaled)))
                if len(ds) == 2:
                    emit(f"grp{i}", ext_mul_dev(
                        ext_add_dev(ds[0], ds[1]),
                        ext_inv_dev(ext_mul_dev(ds[0], ds[1]))))
                else:
                    emit(f"grp{i}", ext_inv_dev(ds[0]))

            # Per-byte mem-link pairs: sel_k/d_k merged in pairs.
            lf = [cols[f] for f in _LOAD_FLAGS]
            sf = [cols[f] for f in _STORE_FLAGS]
            s1b = lf[0]
            for x in lf[1:] + sf:
                s1b = add_mod(s1b, x)
            s2b = cols["flh"]
            for x in ("flhu", "flw", "flwu", "fld", "fsh", "fsw", "fsd"):
                s2b = add_mod(s2b, cols[x])
            s4b = cols["flw"]
            for x in ("flwu", "fld", "fsw", "fsd"):
                s4b = add_mod(s4b, cols[x])
            s8b = add_mod(cols["fld"], cols["fsd"])
            mem_sels = [s1b, s2b, s4b, s4b, s8b, s8b, s8b, s8b]
            base_k = e_scale_b(scalar("ep", 0), cols["bcnt"])
            for j in range(4):
                base_k = ext_add_dev(base_k, e_scale_b(scalar("ep", 1 + j), cols[f"jt_{j}"]))
            base_k = ext_add_dev(base_k, e_scale_b(scalar("ep", 7), cols["fstore"]))
            tau_w_t = e_from_scalar(scalar("tau_w"), (n,))
            mem_dens = []
            for k in range(8):
                kap_k = ext_add_dev(base_k, e_from_scalar(scalar("memk", k), (n,)))
                kap_k = ext_add_dev(kap_k, e_scale_b(scalar("ep", 6), cols[f"vb_{k}"]))
                mem_dens.append(ext_sub_dev(tau_w_t, kap_k))
            for i, (ka, kb) in enumerate(GM_GROUPS):
                da, db = mem_dens[ka], mem_dens[kb]
                num = ext_add_dev(ext_mul_base_dev(db, mem_sels[ka]),
                                  ext_mul_base_dev(da, mem_sels[kb]))
                emit(f"gmp{i}", ext_mul_dev(num, ext_inv_dev(ext_mul_dev(da, db))))

            # Byte-counter chains.
            nb_full = mem_sels[0]
            for k in range(1, 8):
                nb_full = add_mod(nb_full, mem_sels[k])
            d_b1 = ext_sub_dev(
                ext_sub_dev(ext_sub_dev(tau_c_t, bc_idx1), _e_lift_base(cols["bcnt"])),
                _e_lift_base(nb_full))
            d_b2 = ext_sub_dev(ext_sub_dev(tau_c_t, bc_idx), _e_lift_base(cols["bcnt"]))
            emit("g_b1", ext_mul_base_dev(ext_inv_dev(d_b1), sel1))
            emit("g_b2", ext_mul_base_dev(ext_inv_dev(d_b2), sel2))

            # Byte-domain g_lnk over the memcheck rows.
            nA = 1 << mvv
            idxA = jnp.arange(nA, dtype=jnp.uint32)
            idxA_m = to_mont(idxA)
            sel_w = to_mont((jnp.arange(nA, dtype=jnp.int32) <= (A - 1))
                            .astype(jnp.uint32))
            kap_w = e_scale_b(scalar("ep", 0), idxA_m)
            for j in range(4):
                kap_w = ext_add_dev(kap_w, e_scale_b(scalar("ep", 1 + j), cols[f"mc_ba{j}"]))
            kap_w = ext_add_dev(kap_w, e_scale_b(scalar("ep", 5), cols["mc_bk"]))
            kap_w = ext_add_dev(kap_w, e_scale_b(scalar("ep", 6), cols["mc_vw"]))
            kap_w = ext_add_dev(kap_w, e_scale_b(scalar("ep", 7), cols["mc_st"]))
            d_w = ext_sub_dev(e_from_scalar(scalar("tau_w"), (nA,)), kap_w)
            emit("g_lnk", ext_mul_base_dev(ext_inv_dev(d_w), sel_w))

            # h_r16 over the RANGE16 domain.
            idx16 = to_mont(jnp.arange(1 << 16, dtype=jnp.uint32))
            d_h = ext_sub_dev(e_from_scalar(scalar("tau_r"), (1 << 16,)),
                              _e_lift_base(idx16))
            emit("h_r16", ext_mul_base_dev(ext_inv_dev(d_h), m_r16))
            return out

        fn = jax.jit(run)
        _BC_FNS[key] = fn

    sc = {
        "tau": _ext_mont(tau), "tau_c": _ext_mont(tau_c),
        "beta_c": _ext_mont(beta_c), "tau_o": _ext_mont(tau_o),
        "tau_l": _ext_mont(tau_l), "tau_r": _ext_mont(tau_r),
        "tau_w": _ext_mont(tau_w),
        "gp": np.stack([_ext_mont(g) for g in gp]),
        "ob": np.stack([_ext_mont(o) for o in ob]),
        "dl": np.stack([_ext_mont(d) for d in dl]),
        "ep": np.stack([_ext_mont(e) for e in ep]),
        # per-k constant ep[0]*k + ep[5]*k for the mem-link kappas
        "memk": np.stack([
            _ext_mont((ep[0] * k + ep[5] * k) if k else _zero_ext())
            for k in range(8)
        ]),
    }
    return fn(mats, sc)


def _zero_ext():
    from ..core.ext4 import ext_lift

    return ext_lift(0)
