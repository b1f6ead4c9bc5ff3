"""Witness linkage: lookup-validity queries ARE the executed steps.

The validity argument (lookups/validity.py) proves each committed query
multiset consists of genuine table entries, but — as its scope note
records — nothing tied those query columns to the execution witness: a
prover could commit a VALID query set unrelated to the trace.  This
module closes ROADMAP #4 with a logUp multiset equality between

  step side   {(tbl, in0, in1, s) : gadget-covered step}     (flk-selected)
  query side  {(tbl, in0, in1, s) : committed query, table tbl}

where every step-side slot is a PROVEN column: tbl/f3/imm/selector flags
from the bytecode fetch argument (constraints/bytecode.py), operand
limbs rv1/rv2 from the regcheck read cells, and the result limbs res
tied to the regcheck write value whenever the instruction architecturally
writes (fwr * (res - wv) = 0; rd=x0 results stay free advice — the
register file discards them, and the table inclusion still proves the
semantics).  The s-block is (result limbs) for ALU tables and
(funct3, taken, 0, 0) for the branch table, giving downstream
control-flow constraints a PROVEN taken bit.

Query-side slots are linear reconstructions of each gadget's committed
representation (8-bit chunks recombine into 16-bit limbs; SUB swaps its
carry-chain roles back; compare/branch outputs sit in slot s_0/s_1).
The fingerprint challenges (tau_l, delta) are drawn in the bytecode
argument's challenge fork — after the validity commitments, the regcheck
commitment, and the bytecode linkage commitment are all absorbed.

Each table gets a second zerocheck over its query domain proving
g_lk * (tau_l - key) = sel pointwise against the SAME column commitment
the validity argument opened (a second Ligero claim at the new point),
plus an eval+sum-bound g_lk commitment; the verifier checks
sum_t sum(g_lk^t) == sum(g_lk^step).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List, Tuple

import numpy as np

from ..poly.public_mles import le_indicator_eval, le_table, np_inv
from ..proofs.zerocheck import (
    ZerocheckProof,
    ZerocheckProver,
    ZerocheckVerifier,
    make_zerocheck_prover,
)

__all__ = [
    "LINK_SLOTS",
    "QueryLinkRecord",
    "gadget_linkage_arrays",
    "gadget_linkage_scalars",
    "link_deltas",
    "prove_query_links",
    "verify_query_links",
]

LINK_SLOTS = tuple(
    f"{pre}_{j}" for pre in ("in0", "in1", "s") for j in range(4)
)
LINKAGE_DEGREE = 3  # deg(eq * g_lk * key), key linear in committed cols

_M16 = np.uint64(0xFFFF)


def link_deltas(delta: int, p: int) -> List[int]:
    """delta^1..delta^13: the table-id slot then the 12 LINK_SLOTS."""
    out, g = [], 1
    for _ in range(len(LINK_SLOTS) + 1):
        g = g * delta % p
        out.append(g)
    return out


def _zero_like(cols, name: str):
    return np.zeros_like(cols[name])


def gadget_linkage_arrays(tid: int, cols: Dict[str, np.ndarray], p: int):
    """Slot arrays (mod p) reconstructed linearly from a gadget's
    committed query columns.  Row layout mirrors the gadget's build()."""
    P = np.uint64(p)
    two8 = np.uint64(1 << 8)

    def limbs(prefix):
        return [cols[f"{prefix}{j}"] for j in range(4)]

    def chunk16(prefix):
        return [
            (cols[f"{prefix}{2 * j}"] + two8 * cols[f"{prefix}{2 * j + 1}"]) % P
            for j in range(4)
        ]

    def z():
        return np.zeros_like(next(iter(cols.values())))

    if tid == 0:  # ADD: committed (x, y, z) = (in0, in1, out)
        in0, in1, s = limbs("x"), limbs("y"), limbs("z")
    elif tid == 1:  # SUB: committed (x, y, z) = (out, in1, in0)
        in0, in1, s = limbs("z"), limbs("y"), limbs("x")
    elif tid in (2, 3, 4):  # AND/OR/XOR 8-bit chunk triples
        in0, in1, s = chunk16("a"), chunk16("b"), chunk16("o")
    elif tid in (5, 6, 7):  # shifts
        in0, in1, s = limbs("x"), limbs("y"), limbs("z")
    elif tid in (8, 9):  # SLT/SLTU: out is the single bit "o"
        in0, in1, s = limbs("x"), limbs("y"), [cols["o"], z(), z(), z()]
    elif tid == 10:  # BRANCH: s carries (funct3, taken, 0, 0)
        in0, in1, s = limbs("x"), limbs("y"), [cols["f3"], cols["o"], z(), z()]
    elif tid in (13, 14, 15, 16, 17):  # word ops: (x, y) -> z
        in0, in1, s = limbs("x"), limbs("y"), limbs("z")
    elif tid in (18, 19, 20, 21, 22):  # multiplies: byte-committed
        in0 = [(cols[f"xb{2*j}"] + two8 * cols[f"xb{2*j+1}"]) % P
               for j in range(4)]
        in1 = [(cols[f"yb{2*j}"] + two8 * cols[f"yb{2*j+1}"]) % P
               for j in range(4)]
        if tid == 18:  # MUL: low product bytes
            s = [(cols[f"zb{2*j}"] + two8 * cols[f"zb{2*j+1}"]) % P
                 for j in range(4)]
        elif tid == 21:  # MULHU: high product bytes
            s = [(cols[f"zb{8+2*j}"] + two8 * cols[f"zb{8+2*j+1}"]) % P
                 for j in range(4)]
        elif tid in (19, 20):  # MULH/MULHSU: corrected high bytes
            s = [(cols[f"wb{2*j}"] + two8 * cols[f"wb{2*j+1}"]) % P
                 for j in range(4)]
        else:  # MULW: sext32 of the low 32 product bits
            fill = np.uint64(0xFFFF % p) * cols["sw"] % P
            s = [(cols["zb0"] + two8 * cols["zb1"]) % P,
                 (cols["zb2"] + two8 * cols["zb3"]) % P,
                 fill, fill]
    elif tid in range(23, 31):  # divisions: byte-committed q or r
        in0 = [(cols[f"xb{2*j}"] + two8 * cols[f"xb{2*j+1}"]) % P
               for j in range(4)]
        in1 = [(cols[f"yb{2*j}"] + two8 * cols[f"yb{2*j+1}"]) % P
               for j in range(4)]
        pre = "rb" if tid in (25, 26, 29, 30) else "qb"
        if tid >= 27:  # W variants: sext32 via the committed top-bit split
            sw = cols["swr" if pre == "rb" else "swq"]
            fill = np.uint64(0xFFFF % p) * sw % P
            s = [(cols[f"{pre}0"] + two8 * cols[f"{pre}1"]) % P,
                 (cols[f"{pre}2"] + two8 * cols[f"{pre}3"]) % P, fill, fill]
        else:
            s = [(cols[f"{pre}{2*j}"] + two8 * cols[f"{pre}{2*j+1}"]) % P
                 for j in range(4)]
    else:
        raise ValueError(f"no linkage spec for table {tid}")
    return dict(zip(LINK_SLOTS, in0 + in1 + s))


def gadget_linkage_scalars(tid: int, ev: Dict[str, int], p: int) -> Dict[str, int]:
    def limbs(prefix):
        return [ev[f"{prefix}{j}"] % p for j in range(4)]

    def chunk16(prefix):
        return [
            (ev[f"{prefix}{2 * j}"] + (1 << 8) * ev[f"{prefix}{2 * j + 1}"]) % p
            for j in range(4)
        ]

    if tid == 0:
        in0, in1, s = limbs("x"), limbs("y"), limbs("z")
    elif tid == 1:
        in0, in1, s = limbs("z"), limbs("y"), limbs("x")
    elif tid in (2, 3, 4):
        in0, in1, s = chunk16("a"), chunk16("b"), chunk16("o")
    elif tid in (5, 6, 7, 13, 14, 15, 16, 17):
        in0, in1, s = limbs("x"), limbs("y"), limbs("z")
    elif tid in (8, 9):
        in0, in1, s = limbs("x"), limbs("y"), [ev["o"] % p, 0, 0, 0]
    elif tid == 10:
        in0, in1, s = limbs("x"), limbs("y"), [ev["f3"] % p, ev["o"] % p, 0, 0]
    elif tid in (18, 19, 20, 21, 22):
        in0 = chunk16("xb")
        in1 = chunk16("yb")
        if tid == 18:
            s = [(ev[f"zb{2*j}"] + (1 << 8) * ev[f"zb{2*j+1}"]) % p
                 for j in range(4)]
        elif tid == 21:
            s = [(ev[f"zb{8+2*j}"] + (1 << 8) * ev[f"zb{8+2*j+1}"]) % p
                 for j in range(4)]
        elif tid in (19, 20):
            s = chunk16("wb")
        else:
            fill = 0xFFFF * ev["sw"] % p
            s = [(ev["zb0"] + (1 << 8) * ev["zb1"]) % p,
                 (ev["zb2"] + (1 << 8) * ev["zb3"]) % p, fill, fill]
    elif tid in range(23, 31):
        in0 = chunk16("xb")
        in1 = chunk16("yb")
        pre = "rb" if tid in (25, 26, 29, 30) else "qb"
        if tid >= 27:
            sw = ev["swr" if pre == "rb" else "swq"] % p
            fill = 0xFFFF * sw % p
            s = [(ev[f"{pre}0"] + (1 << 8) * ev[f"{pre}1"]) % p,
                 (ev[f"{pre}2"] + (1 << 8) * ev[f"{pre}3"]) % p, fill, fill]
        else:
            s = [(ev[f"{pre}{2*j}"] + (1 << 8) * ev[f"{pre}{2*j+1}"]) % p
                 for j in range(4)]
    else:
        raise ValueError(f"no linkage spec for table {tid}")
    return dict(zip(LINK_SLOTS, in0 + in1 + s))


def _key_array(tid: int, slots: Dict[str, np.ndarray], dl: List[int], p: int):
    P = np.uint64(p)
    acc = np.full_like(slots[LINK_SLOTS[0]], dl[0] * (tid + 1) % p)
    for k, name in enumerate(LINK_SLOTS):
        acc = (acc + np.uint64(dl[k + 1]) * slots[name]) % P
    return acc


def _key_scalar(tid: int, slots: Dict[str, int], dl: List[int], p: int) -> int:
    acc = dl[0] * (tid + 1) % p
    for k, name in enumerate(LINK_SLOTS):
        acc = (acc + dl[k + 1] * slots[name]) % p
    return acc


@dataclass
class QueryLinkRecord:
    table_id: int
    num_queries: int
    num_vars: int
    root_g: bytes
    zc: ZerocheckProof  # query-domain zerocheck (gadget cols + g_lk)
    cols_proof: object  # extra Ligero claim on the validity cols root
    g_proof: object  # g_lk eval + hypercube-sum claims
    g_sum: int


def _make_link_combiner(gadget, tid: int, tau_l: int, dl: List[int],
                        num_queries: int, num_vars: int, p: int):
    def combiner(cols, alphas: List[int], p_: int):
        P = np.uint64(p)
        slots = gadget_linkage_arrays(tid, cols, p)
        key = _key_array(tid, slots, dl, p)
        t = (cols["g_lk"] * ((np.uint64(tau_l) + P - key) % P) % P
             + P - cols["__sel__"]) % P
        return np.uint64(alphas[0]) * t % P

    def combiner_scalar(ev, alphas: List[int], p_: int) -> int:
        rs = combiner_scalar.final_point
        sel = le_indicator_eval(num_queries - 1, num_vars, rs, p)
        slots = gadget_linkage_scalars(tid, ev, p)
        key = _key_scalar(tid, slots, dl, p)
        return alphas[0] * ((ev["g_lk"] * ((tau_l - key) % p) - sel) % p) % p

    combiner_scalar.final_point = None
    return combiner, combiner_scalar


def link_denominators(tid: int, cols: Dict[str, np.ndarray], nq: int,
                      tau_l: int, dl: List[int], p: int) -> np.ndarray:
    slots = gadget_linkage_arrays(tid, cols, p)
    key = _key_array(tid, slots, dl, p)
    return (np.uint64(tau_l) + np.uint64(p) - key) % np.uint64(p)


def prove_query_links(F, transcript, validity_info: List[dict], tau_l: int,
                      delta: int, hash_mode: str = "sha3") -> Tuple[List[QueryLinkRecord], int]:
    """``validity_info``: per-table dicts with keys gadget/cols/state/nq/v
    (retained from prove_lookup_validity).  Returns (records, total g sum).
    The caller draws (tau_l, delta) after ALL referenced commitments."""
    from ..commitments.ligero import (
        LigeroClaim,
        _row_col_weights,
        ligero_commit,
        ligero_prove_claims,
    )

    p = F.MODULUS
    records: List[QueryLinkRecord] = []
    total = 0
    for info in validity_info:
        tid = info["tid"]
        gadget = info["gadget"]
        nq, v = info["nq"], info["v"]
        dl = link_deltas(delta, p)
        sel = le_table(nq - 1, v)
        den = link_denominators(tid, info["cols"], nq, tau_l, dl, p)
        g_lk = sel * np_inv(den, p) % np.uint64(p)
        g_state = ligero_commit(F, {"g_lk": g_lk}, hash_mode)
        g_sum = int(g_lk.sum(dtype=np.uint64)) % p
        total = (total + g_sum) % p
        transcript.append_bytes(b"LK_G")
        transcript.append_u64(tid)
        transcript.append_bytes(g_state.root)
        transcript.append_u64(g_sum)

        zc_cols = dict(info["cols"])
        zc_cols["g_lk"] = g_lk
        zc_cols["__sel__"] = sel
        combiner, _ = _make_link_combiner(gadget, tid, tau_l, dl, nq, v, p)
        zc = make_zerocheck_prover(F, zc_cols, combiner, LINKAGE_DEGREE,
                                   num_alphas=1).prove(transcript)

        a, b = _row_col_weights(zc.final_point, info["state"].cn)
        cols_proof = ligero_prove_claims(
            info["state"], [LigeroClaim(a=a, b=b, values={})], transcript
        )
        ag, bg = _row_col_weights(zc.final_point, g_state.cn)
        g_proof = ligero_prove_claims(g_state, [
            LigeroClaim(a=ag, b=bg, values={}),
            LigeroClaim(a=np.ones(g_state.m, dtype=np.uint64),
                        b=np.ones(g_state.n, dtype=np.uint64), values={}),
        ], transcript)
        records.append(QueryLinkRecord(
            table_id=tid, num_queries=nq, num_vars=v, root_g=g_state.root,
            zc=zc, cols_proof=cols_proof, g_proof=g_proof, g_sum=g_sum,
        ))
    return records, total


def verify_query_links(F, transcript, links: List[QueryLinkRecord],
                       lv_tables: List, tau_l: int, delta: int,
                       hash_mode: str = "sha3") -> Tuple[bool, int]:
    """Verify against the validity proof's table records (roots + shapes
    must match).  Returns (ok, total query-side g sum)."""
    from ..commitments.ligero import (
        LigeroClaim,
        LigeroParams,
        _row_col_weights,
        ligero_verify_claims,
    )
    from ..lookups.validity import GADGETS

    p = F.MODULUS
    if len(links) != len(lv_tables):
        return False, 0
    params = LigeroParams()
    dl = link_deltas(delta, p)
    total = 0
    for link, rec in zip(links, lv_tables):
        tid = rec.table_id
        if link.table_id != tid or link.num_queries != rec.num_queries:
            return False, 0
        if link.num_vars != rec.num_vars:
            return False, 0
        gadget = GADGETS[tid]
        total = (total + link.g_sum % p) % p
        transcript.append_bytes(b"LK_G")
        transcript.append_u64(tid)
        transcript.append_bytes(link.root_g)
        transcript.append_u64(link.g_sum % p)

        names = sorted(gadget.columns)
        if set(link.zc.column_evals) != set(names) | {"g_lk"}:
            return False, 0
        if link.zc.num_vars != rec.num_vars or link.zc.degree != LINKAGE_DEGREE:
            return False, 0
        _, scalar = _make_link_combiner(gadget, tid, tau_l, dl,
                                        rec.num_queries, rec.num_vars, p)
        scalar.final_point = link.zc.final_point
        if not ZerocheckVerifier(F, scalar, 1, LINKAGE_DEGREE).verify(
            link.zc, transcript
        ):
            return False, 0

        cn = params.choose_split(rec.num_vars, len(names))
        a, b = _row_col_weights(link.zc.final_point, cn)
        if not ligero_verify_claims(
            F, rec.root_cols, rec.num_vars, names,
            [LigeroClaim(a=a, b=b,
                         values={nm: link.zc.column_evals[nm] for nm in names})],
            link.cols_proof, transcript, hash_mode,
        ):
            return False, 0
        cn_g = params.choose_split(rec.num_vars, 1)
        ag, bg = _row_col_weights(link.zc.final_point, cn_g)
        m_g = (1 << rec.num_vars) >> cn_g
        if not ligero_verify_claims(
            F, link.root_g, rec.num_vars, ["g_lk"],
            [
                LigeroClaim(a=ag, b=bg,
                            values={"g_lk": link.zc.column_evals["g_lk"]}),
                LigeroClaim(a=np.ones(m_g, dtype=np.uint64),
                            b=np.ones(1 << cn_g, dtype=np.uint64),
                            values={"g_lk": link.g_sum % p}),
            ],
            link.g_proof, transcript, hash_mode,
        ):
            return False, 0
    return True, total
