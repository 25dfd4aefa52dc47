"""CKKS homomorphic encoding-matrix evaluation: CoeffToSlot / SlotToCoeff,
the linear-transform half of bootstrapping (reference
`scheme/ckks/src/bootstrapping.rs`; no EvalMod/sine in the reference either).

The sfft factor matrices are pre-multiplied in chunks of r (`:23-31`), the
rotation keys harvested from the BSGS plans (`:56-71`), and each factor is
applied by baby-step rotations + diagonal constant-muls + giant-step
rotations of partial sums (`:90-108`).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import cached_property, partial

import jax
import jax.numpy as jnp
import numpy as np

from ...ops.ntt import eval_automorphism_perm
from ...ops.rns import (
    extend_bases,
    rescale_k,
    rns_add,
    rns_intt,
    rns_mul_eval,
    rns_ntt,
    rns_plan,
)
from ...utils.dd import DDC
from ...utils.matrix import bsgs_plan, mat_product
from . import ckks as C
from .ckks import CkksCiphertext, CkksParams, CkksRotKey
from .sfft import sfft_fmats, sifft_fmats


@dataclass(frozen=True)
class BootstrapParams:
    params: CkksParams
    r: int  # factors pre-multiplied in chunks of r (`bootstrapping.rs:23-31`)

    @cached_property
    def sfft_mats(self) -> list[dict[int, DDC]]:
        return _chunked(sfft_fmats(self.params.l), self.r, self.params.l)

    @cached_property
    def sifft_mats(self) -> list[dict[int, DDC]]:
        return _chunked(sifft_fmats(self.params.l), self.r, self.params.l)


def _chunked(mats, r, n):
    return [mat_product(mats[i : i + r], n) for i in range(0, len(mats), r)]


@dataclass
class BootstrapKey:
    bp: BootstrapParams
    rtk: dict[int, CkksRotKey]
    # EVAL-basis encoded-diagonal cache (QP basis, post-NTT device arrays)
    # keyed by ((tag, chunk), diag index, giant step, level basis) — stable
    # identifiers, never object ids: the sifft encode runs in host
    # double-double arithmetic and would otherwise dominate repeated
    # CoeffToSlot/SlotToCoeff calls
    pt_cache: dict = None

    def __post_init__(self):
        if self.pt_cache is None:
            self.pt_cache = {}


def key_gen(bp: BootstrapParams, sk: np.ndarray, rng: np.random.Generator) -> BootstrapKey:
    """Harvest exactly the BSGS rotation indices (`bootstrapping.rs:56-71`)."""
    needed: set[int] = set()
    for mat in [*bp.sfft_mats, *bp.sifft_mats]:
        plan = bsgs_plan(list(mat.keys()))
        needed.update(plan.keys())
        for js in plan.values():
            needed.update(js)
    needed.discard(0)
    rtk = C.rtk_gen_many(bp.params, sk, sorted(needed), rng)
    return BootstrapKey(bp, rtk)


def slot_to_coeff(bk: BootstrapKey, ct: CkksCiphertext) -> CkksCiphertext:
    return _mul_mats(bk, bk.bp.sfft_mats, ct, "sfft")


def coeff_to_slot(bk: BootstrapKey, ct: CkksCiphertext) -> CkksCiphertext:
    return _mul_mats(bk, bk.bp.sifft_mats, ct, "sifft")


def _mul_mats(bk: BootstrapKey, mats, ct: CkksCiphertext, tag: str) -> CkksCiphertext:
    for chunk, mat in reversed(list(enumerate(mats))):
        ct = _mul_mat(bk, mat, ct, (tag, chunk))
    return ct


@partial(jax.jit, static_argnums=(0,))
def _pt_eval(qs: tuple, pt: jnp.ndarray) -> jnp.ndarray:
    return rns_ntt(pt, rns_plan(qs, pt.shape[-1]))


@partial(jax.jit, static_argnums=(0, 1))
def _bsgs_apply(
    params: CkksParams,
    items: tuple,  # ((i, (j, ...)), ...) — the static BSGS plan
    ct: CkksCiphertext,
    baby_rtks: tuple,  # CkksRotKey per nonzero baby j (plan order)
    giant_rtks: tuple,  # CkksRotKey per nonzero giant i (items order)
    pts: tuple,  # per item: tuple of (L+P, N) EVAL-basis encoded diagonals
) -> CkksCiphertext:
    """One BSGS sparse-diagonal matrix application as a single fused program.

    v2 of the reference's per-rotation chain (`bootstrapping.rs:90-108`),
    redesigned around evaluation-basis residency (the HBM-bound regime of
    ARCHITECTURE §6): the ciphertext is base-extended and forward-transformed
    ONCE ("hoisting", eprint 2018/1043 §5.3); each baby-step rotation is an
    eval-slot permutation + pointwise key product; diagonal plaintexts
    multiply and accumulate IN the evaluation basis with the hybrid
    key-switch P-rescale deferred to one inverse transform per giant group
    (lazy rescaling). Transform count per chunk drops from
    ~|babies|*(3L') + |diags|*4L to 2 + 3*|giants|."""
    qs = ct.qs
    ps = params.ps
    qps = qs + ps
    plan_qp = rns_plan(qps, ct.a.shape[-1])
    plan_q = rns_plan(qs, ct.a.shape[-1])
    L = len(qs)
    n = ct.a.shape[-1]
    idx = [params.qps.index(q) for q in qps]

    ae = C._ks_hoist(params, ct.a, qs)  # (..., D, L+P, N) per-digit hoist
    # NTT(ct.a) over the q basis for the key-switch-free (j=0) diagonal
    # products: with one digit it is exactly the first L hoisted rows; with
    # dnum digits each row mixes one digit only, so transform a directly.
    ae_q = ae[..., 0, :L, :] if ae.shape[-3] == 1 else rns_ntt(ct.a, plan_q)
    be = rns_ntt(ct.b, plan_q)

    W = {}  # j -> (ksk_b . perm(ae), ksk_a . perm(ae), perm(be)) in eval
    for rtk in baby_rtks:
        t = params.pow5(rtk.j)
        perm = jnp.asarray(eval_automorphism_perm(n, t))
        aer = ae[..., perm]
        W[rtk.j] = (
            C._ks_dot(C._ksk_digits(params, rtk.ksk.b, L, idx), aer, plan_qp),
            C._ks_dot(C._ksk_digits(params, rtk.ksk.a, L, idx), aer, plan_qp),
            be[..., perm],
        )

    giants = {rtk.j: rtk for rtk in giant_rtks}
    out = None
    for (i, ijs), pt_group in zip(items, pts):
        acc_pb = acc_pa = None  # QP basis, carry the P factor
        acc_bb = acc_aq = None  # q basis
        for j, pt in zip(ijs, pt_group):
            if j == 0:
                tb = rns_mul_eval(pt[:L], be, plan_q)
                ta = rns_mul_eval(pt[:L], ae_q, plan_q)
                acc_bb = tb if acc_bb is None else rns_add(acc_bb, tb, plan_q)
                acc_aq = ta if acc_aq is None else rns_add(acc_aq, ta, plan_q)
            else:
                wb, wa, bej = W[j]
                tb = rns_mul_eval(pt, wb, plan_qp)
                ta = rns_mul_eval(pt, wa, plan_qp)
                tbb = rns_mul_eval(pt[:L], bej, plan_q)
                acc_pb = tb if acc_pb is None else rns_add(acc_pb, tb, plan_qp)
                acc_pa = ta if acc_pa is None else rns_add(acc_pa, ta, plan_qp)
                acc_bb = tbb if acc_bb is None else rns_add(acc_bb, tbb, plan_q)
        b_i = rns_intt(acc_bb, plan_q)
        if acc_pb is not None:
            kb = rescale_k(rns_intt(acc_pb, plan_qp), qps, len(ps))
            ka = rescale_k(rns_intt(acc_pa, plan_qp), qps, len(ps))
            b_i = rns_add(b_i, kb, plan_q)
            a_i = ka
        else:
            a_i = jnp.zeros_like(b_i)
        if acc_aq is not None:
            a_i = rns_add(a_i, rns_intt(acc_aq, plan_q), plan_q)
        part = C.rescale_ct(CkksCiphertext(b_i, a_i, qs))
        moved = part if i == 0 else C.rotate(params, giants[i], part)
        out = moved if out is None else C.add(out, moved)
    return out


def _mul_mat(
    bk: BootstrapKey, mat: dict[int, DDC], ct: CkksCiphertext, mat_key: tuple
) -> CkksCiphertext:
    """BSGS sparse-diagonal apply (`bootstrapping.rs:90-108`), fused through
    `_bsgs_apply`; diagonals are encoded over the FULL QP basis and cached
    in the evaluation basis keyed by stable identifiers."""
    params = bk.bp.params
    plan = bsgs_plan(list(mat.keys()))
    items = tuple(sorted((i, tuple(sorted(jss))) for i, jss in plan.items()))
    babies = tuple(sorted({j for _, jss in items for j in jss if j != 0}))
    giants = tuple(sorted({i for i, _ in items if i != 0}))
    qps = ct.qs + params.ps
    pts = []
    for i, ijs in items:
        group = []
        for j in ijs:
            key = (mat_key, (i + j) % params.l, i, ct.qs)
            pt = bk.pt_cache.get(key)
            if pt is None:
                diag = mat[(i + j) % params.l].roll(i)  # rot_iter(-i)
                # encode at the scale of the prime this chunk's rescale
                # drops, so the ciphertext scale is INVARIANT through the
                # transform (S' = S * enc/q_top = S). With the reference's
                # uniform primes this only redistributes deterministic
                # sub-ulp drift; with a production prime LADDER it is what
                # keeps the stage scales from drifting by the prime-size
                # ratio (production.py).
                pt = _pt_eval(qps, C.encode(params, diag, qps, scale_int=ct.qs[-1]))
                bk.pt_cache[key] = pt
            group.append(pt)
        pts.append(tuple(group))
    return _bsgs_apply(
        params,
        items,
        ct,
        tuple(bk.rtk[j] for j in babies),
        tuple(bk.rtk[i % params.l] for i in giants),
        tuple(pts),
    )
