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
from functools import cached_property

import numpy as np

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
    # encoded-diagonal plaintext cache keyed by ((tag, chunk), diag index,
    # level basis) — stable identifiers, never object ids: the sifft encode
    # runs in host double-double arithmetic and would otherwise dominate
    # repeated CoeffToSlot/SlotToCoeff calls
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
    rtk = {j: C.rtk_gen(bp.params, sk, j, rng) for j in sorted(needed)}
    return BootstrapKey(bp, rtk)


def slot_to_coeff(bk: BootstrapKey, ct: CkksCiphertext) -> CkksCiphertext:
    return _mul_mats(bk, bk.bp.sfft_mats, ct, "sfft")


def coeff_to_slot(bk: BootstrapKey, ct: CkksCiphertext) -> CkksCiphertext:
    return _mul_mats(bk, bk.bp.sifft_mats, ct, "sifft")


def _mul_mats(bk: BootstrapKey, mats, ct: CkksCiphertext, tag: str) -> CkksCiphertext:
    for chunk, mat in reversed(list(enumerate(mats))):
        ct = _mul_mat(bk, mat, ct, (tag, chunk))
    return ct


def _mul_mat(
    bk: BootstrapKey, mat: dict[int, DDC], ct: CkksCiphertext, mat_key: tuple
) -> CkksCiphertext:
    """BSGS: baby rotations of ct, diag-rotated constant muls, giant-step
    rotation of partial sums (`bootstrapping.rs:90-108`)."""
    params = bk.bp.params

    def rot(j, c):
        return c if j == 0 else C.rotate(params, bk.rtk[j], c)

    plan = bsgs_plan(list(mat.keys()))
    js = sorted({j for js in plan.values() for j in js})
    ct_rot = {j: rot(j, ct) for j in js}
    out = None
    for i, jss in plan.items():
        partial = None
        for j in jss:
            key = (mat_key, (i + j) % params.l, i, ct.qs)
            pt = bk.pt_cache.get(key)
            if pt is None:
                diag = mat[(i + j) % params.l].roll(i)  # rot_iter(-i)
                pt = C.encode(params, diag, ct.qs)
                bk.pt_cache[key] = pt
            term = C._mul_pt(params, pt, ct_rot[j])
            partial = term if partial is None else C.add(partial, term)
        moved = rot(i, partial)
        out = moved if out is None else C.add(out, moved)
    return out
