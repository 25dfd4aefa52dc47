"""RNS (CRT-limb) polynomial arithmetic with a stacked limb axis.

The reference's `RnsRq` (`util/src/ring/rns.rs`) is a Vec of per-prime rings;
here an RNS polynomial is ONE array of shape (..., L, N) u64 with the limb
axis second-to-last -- the natural TPU shard axis (SURVEY.md §2.5): every
per-limb op is embarrassingly parallel over it, and the two cross-limb
reductions (`extend_bases`, `rescale`) become axis contractions / collectives.

Per-limb constants (twiddles, Montgomery factors, CRT hats) are stacked into
(L, ...) arrays and broadcast, so one fused kernel serves all limbs. The
approximate base extension reproduces `rns.rs:331-345` exactly: the overflow
count u = round(sum_i v~_i / q_i) is accumulated in f64, and the correction
subtracts (u * Q) mod p via a precomputed table indexed by u.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import lru_cache

import jax.numpy as jnp
import numpy as np

from ..utils.primes import mod_inverse
from .modular import MASK32, mulhi64, u64
from .ntt import bit_reverse_indices, ntt_plan


# ---------------------------------------------------------------------------
# Stacked-limb modular primitives (q is an (L, 1)-broadcastable u64 array)
# ---------------------------------------------------------------------------


def add_mod_v(a, b, q):
    s = u64(a) + u64(b)
    return jnp.minimum(s, s - q)  # min-trick (see ops/modular.py)


def sub_mod_v(a, b, q):
    d = u64(a) - u64(b)
    return jnp.minimum(d, d + q)


def neg_mod_v(a, q):
    a = u64(a)
    return jnp.where(a == 0, a, q - a)


def mul_shoup_v(a, w, w_shoup, q):
    a = u64(a)
    hi = mulhi64(a, u64(w_shoup))
    r = a * u64(w) - hi * q
    return jnp.minimum(r, r - q)


def _redc_v(t_hi, t_lo, q, neg_q_inv):
    m = t_lo * neg_q_inv
    mq_hi = mulhi64(m, q)
    carry = (t_lo != 0).astype(jnp.uint64)
    t = t_hi + mq_hi + carry
    return jnp.minimum(t, t - q)


def mul_mod_v(a, b, q, neg_q_inv, r2):
    """General product with per-limb Montgomery constants."""
    a = u64(a)
    b = u64(b)
    t = _redc_v(mulhi64(a, b), a * b, q, neg_q_inv)
    return _redc_v(mulhi64(t, r2), t * r2, q, neg_q_inv)


# ---------------------------------------------------------------------------
# Plan: stacked NTT + CRT tables for a prime basis
# ---------------------------------------------------------------------------


@dataclass(frozen=True, eq=False)
class RnsPlan:
    qs: tuple[int, ...]
    n: int
    log_n: int
    # stacked NTT tables, shape (L, n)
    psi_br: np.ndarray
    psi_br_shoup: np.ndarray
    psi_inv_br: np.ndarray
    psi_inv_br_shoup: np.ndarray
    n_inv: np.ndarray  # (L, 1)
    n_inv_shoup: np.ndarray
    # Montgomery constants, shape (L, 1)
    q_arr: np.ndarray
    neg_q_inv: np.ndarray
    r2: np.ndarray

    @property
    def big_q(self) -> int:
        out = 1
        for q in self.qs:
            out *= q
        return out


@lru_cache(maxsize=None)
def rns_plan(qs: tuple[int, ...], n: int) -> RnsPlan:
    plans = [ntt_plan(q, n) for q in qs]
    stack = lambda attr: np.stack([getattr(p, attr) for p in plans])
    col = lambda vals: np.array(vals, dtype=np.uint64)[:, None]
    return RnsPlan(
        qs=qs,
        n=n,
        log_n=n.bit_length() - 1,
        psi_br=stack("psi_br"),
        psi_br_shoup=stack("psi_br_shoup"),
        psi_inv_br=stack("psi_inv_br"),
        psi_inv_br_shoup=stack("psi_inv_br_shoup"),
        n_inv=col([p.n_inv for p in plans]),
        n_inv_shoup=col([p.n_inv_shoup for p in plans]),
        q_arr=col([q for q in qs]),
        neg_q_inv=col([p.zq.neg_q_inv for p in plans]),
        r2=col([p.zq.r2 for p in plans]),
    )


def fwd_stages(out, psi_br, psi_br_shoup, q):
    """DIT forward butterfly chain over the trailing axis, batched over
    (..., L); radix-4 fused passes (two layers per memory pass — the
    pipelines are HBM-bound, measurement in ops/ntt32.py).

    Tables are (L, n)-indexable arrays: numpy constants from a plan, or
    traced per-shard gathers for the coefficient-sharded transform
    (parallel/coef.py builds compact per-device tables with this same
    layout); `q` is (L, 1).
    """
    n = out.shape[-1]
    log_n = n.bit_length() - 1
    batch = out.shape[:-1]

    def tab(t, lo, hi):
        # (L, n)-indexable table contract: numpy constants from a plan, or
        # traced per-shard gathers (parallel/coef.py relies on this slicing).
        return t[:, lo:hi]

    def r2(out, layer):
        m = 1 << layer
        half = n >> (layer + 1)
        x = out.reshape(*batch, m, 2, half)
        uu, vv = x[..., 0, :], x[..., 1, :]
        t = tab(psi_br, m, 2 * m)[:, :, None]
        ts = tab(psi_br_shoup, m, 2 * m)[:, :, None]
        qq = q[:, None, :]
        tv = mul_shoup_v(vv, t, ts, qq)
        return jnp.stack(
            [add_mod_v(uu, tv, qq), sub_mod_v(uu, tv, qq)], axis=-2
        ).reshape(*batch, n)

    def r4(out, layer):
        m = 1 << layer
        quarter = n >> (layer + 2)
        x = out.reshape(*batch, m, 4, quarter)
        x0, x1, x2, x3 = (x[..., i, :] for i in range(4))
        qq = q[:, None, :]
        w1 = tab(psi_br, m, 2 * m)[:, :, None]
        w1s = tab(psi_br_shoup, m, 2 * m)[:, :, None]
        w2 = tab(psi_br, 2 * m, 4 * m).reshape(-1, m, 2)
        w2s = tab(psi_br_shoup, 2 * m, 4 * m).reshape(-1, m, 2)
        t2 = mul_shoup_v(x2, w1, w1s, qq)
        t3 = mul_shoup_v(x3, w1, w1s, qq)
        a0 = add_mod_v(x0, t2, qq)
        a1 = add_mod_v(x1, t3, qq)
        b0 = sub_mod_v(x0, t2, qq)
        b1 = sub_mod_v(x1, t3, qq)
        u1 = mul_shoup_v(a1, w2[:, :, 0:1], w2s[:, :, 0:1], qq)
        u3 = mul_shoup_v(b1, w2[:, :, 1:2], w2s[:, :, 1:2], qq)
        return jnp.stack(
            [
                add_mod_v(a0, u1, qq),
                sub_mod_v(a0, u1, qq),
                add_mod_v(b0, u3, qq),
                sub_mod_v(b0, u3, qq),
            ],
            axis=-2,
        ).reshape(*batch, n)

    layer = 0
    if log_n % 2:
        out = r2(out, 0)
        layer = 1
    while layer < log_n:
        out = r4(out, layer)
        layer += 2
    return out


def inv_stages(out, psi_inv_br, psi_inv_br_shoup, q):
    """GS inverse butterfly chain (no final n^-1 scale — callers own it)."""
    n = out.shape[-1]
    log_n = n.bit_length() - 1
    batch = out.shape[:-1]

    def tab(t, lo, hi):
        # (L, n)-indexable table contract: numpy constants from a plan, or
        # traced per-shard gathers (parallel/coef.py relies on this slicing).
        return t[:, lo:hi]

    def r2i(out, layer):
        m = 1 << layer
        half = n >> (layer + 1)
        x = out.reshape(*batch, m, 2, half)
        uu, vv = x[..., 0, :], x[..., 1, :]
        t = tab(psi_inv_br, m, 2 * m)[:, :, None]
        ts = tab(psi_inv_br_shoup, m, 2 * m)[:, :, None]
        qq = q[:, None, :]
        s = add_mod_v(uu, vv, qq)
        d = mul_shoup_v(sub_mod_v(uu, vv, qq), t, ts, qq)
        return jnp.stack([s, d], axis=-2).reshape(*batch, n)

    def r4i(out, layer):
        m = 1 << layer
        quarter = n >> (layer + 2)
        x = out.reshape(*batch, m, 4, quarter)
        x0, x1, x2, x3 = (x[..., i, :] for i in range(4))
        qq = q[:, None, :]
        wi1 = tab(psi_inv_br, m, 2 * m)[:, :, None]
        wi1s = tab(psi_inv_br_shoup, m, 2 * m)[:, :, None]
        wi2 = tab(psi_inv_br, 2 * m, 4 * m).reshape(-1, m, 2)
        wi2s = tab(psi_inv_br_shoup, 2 * m, 4 * m).reshape(-1, m, 2)
        a0 = add_mod_v(x0, x1, qq)
        a1 = mul_shoup_v(sub_mod_v(x0, x1, qq), wi2[:, :, 0:1], wi2s[:, :, 0:1], qq)
        b0 = add_mod_v(x2, x3, qq)
        b1 = mul_shoup_v(sub_mod_v(x2, x3, qq), wi2[:, :, 1:2], wi2s[:, :, 1:2], qq)
        return jnp.stack(
            [
                add_mod_v(a0, b0, qq),
                add_mod_v(a1, b1, qq),
                mul_shoup_v(sub_mod_v(a0, b0, qq), wi1, wi1s, qq),
                mul_shoup_v(sub_mod_v(a1, b1, qq), wi1, wi1s, qq),
            ],
            axis=-2,
        ).reshape(*batch, n)

    layer = log_n - 2
    while layer >= (1 if log_n % 2 else 0):
        out = r4i(out, layer)
        layer -= 2
    if log_n % 2:
        out = r2i(out, 0)
    return out


def rns_ntt(a: jnp.ndarray, plan: RnsPlan) -> jnp.ndarray:
    """Forward NTT over the trailing axis, batched over (..., L)."""
    if plan.n == 1:
        return u64(a)
    return fwd_stages(
        u64(a), plan.psi_br, plan.psi_br_shoup, jnp.asarray(plan.q_arr)
    )


def rns_intt(a: jnp.ndarray, plan: RnsPlan) -> jnp.ndarray:
    if plan.n == 1:
        return u64(a)
    q = jnp.asarray(plan.q_arr)
    out = inv_stages(u64(a), plan.psi_inv_br, plan.psi_inv_br_shoup, q)
    return mul_shoup_v(
        out, jnp.asarray(plan.n_inv), jnp.asarray(plan.n_inv_shoup), q
    )


def rns_add(a, b, plan: RnsPlan):
    return add_mod_v(a, b, jnp.asarray(plan.q_arr))


def rns_sub(a, b, plan: RnsPlan):
    return sub_mod_v(a, b, jnp.asarray(plan.q_arr))


def rns_neg(a, plan: RnsPlan):
    return neg_mod_v(a, jnp.asarray(plan.q_arr))


def rns_mul_eval(a, b, plan: RnsPlan):
    """Pointwise product in evaluation basis."""
    return mul_mod_v(
        a, b, jnp.asarray(plan.q_arr), jnp.asarray(plan.neg_q_inv), jnp.asarray(plan.r2)
    )


def rns_mul(a, b, plan: RnsPlan):
    """Coefficient-basis negacyclic product, all limbs fused."""
    return rns_intt(rns_mul_eval(rns_ntt(a, plan), rns_ntt(b, plan), plan), plan)


def rns_from_i64(v, plan: RnsPlan) -> jnp.ndarray:
    """Broadcast signed coefficients (..., N) into all limbs (..., L, N)."""
    vi = jnp.asarray(v, dtype=jnp.int64)[..., None, :]
    qs = jnp.asarray(plan.q_arr.astype(np.int64))  # (L, 1)
    return (vi % qs).astype(jnp.uint64)


# ---------------------------------------------------------------------------
# Base extension / rescaling (`rns.rs:83-132,278-345`)
# ---------------------------------------------------------------------------


@dataclass(frozen=True, eq=False)
class BaseExtendPlan:
    """Tables for extending base qs -> ps (`Rns::with_ps`, `rns.rs:305-322`)."""

    qs: tuple[int, ...]
    ps: tuple[int, ...]
    q_hats_inv: np.ndarray  # (Lq, 1) q_hat_i^-1 mod q_i
    q_hats_inv_shoup: np.ndarray
    q_fracs: np.ndarray  # (Lq, 1) f64 1/q_i
    q_hats_ps: np.ndarray  # (Lp, Lq, 1) q_hat_i mod p_j
    uq_ps_t: np.ndarray  # (Lq+1, Lp) (u*Q) mod p_j, u-major for one gather
    # stacked output-prime constants, shape (Lp, 1)
    p_arr: np.ndarray
    neg_p_inv: np.ndarray  # -p^-1 mod 2^64 (REDC)
    p_r2: np.ndarray  # 2^128 mod p
    p_barrett_m: np.ndarray  # floor(2^64 / p)


@lru_cache(maxsize=None)
def base_extend_plan(qs: tuple[int, ...], ps: tuple[int, ...]) -> BaseExtendPlan:
    big_q = 1
    for q in qs:
        big_q *= q
    q_hats = [big_q // q for q in qs]
    q_hats_inv = [mod_inverse(h % q, q) for h, q in zip(q_hats, qs)]
    from .modular import shoup_precompute

    qhi = np.array(q_hats_inv, dtype=np.uint64)[:, None]
    qhi_shoup = np.stack(
        [shoup_precompute(int(h), q) for h, q in zip(q_hats_inv, qs)]
    ).reshape(-1, 1)
    col = lambda vals: np.array(vals, dtype=np.uint64)[:, None]
    return BaseExtendPlan(
        qs=qs,
        ps=ps,
        q_hats_inv=qhi,
        q_hats_inv_shoup=qhi_shoup,
        q_fracs=np.array([1.0 / q for q in qs], dtype=np.float64)[:, None],
        q_hats_ps=np.array(
            [[h % p for h in q_hats] for p in ps], dtype=np.uint64
        )[:, :, None],
        uq_ps_t=np.array(
            [[(u * big_q) % p for p in ps] for u in range(len(qs) + 1)],
            dtype=np.uint64,
        ),
        p_arr=col(ps),
        neg_p_inv=col([(-pow(p, -1, 1 << 64)) % (1 << 64) for p in ps]),
        p_r2=col([(1 << 128) % p for p in ps]),
        p_barrett_m=col([(1 << 64) // p for p in ps]),
    )


def extend_bases(x: jnp.ndarray, qs: tuple[int, ...], ps: tuple[int, ...]) -> jnp.ndarray:
    """Approximate base extension (`rns.rs:331-345`): x (..., Lq, N) -> (..., Lp, N).

    v~_i = x_i * q_hat_i^-1 mod q_i; u = round(sum v~_i / q_i) in f64;
    out_j = sum_i (q_hat_i mod p_j) * v~_i - (u*Q mod p_j).

    One stacked contraction serves every output prime: the (Lp, Lq, N)
    broadcast-product feeds straight into the limb-axis reduction so XLA keeps
    it in registers/VMEM (one fused kernel, one pass over v) instead of Lp
    separate dispatches.  No per-prime pre-reduction is needed: Montgomery
    REDC is exact for any a*b < p*2^64, and v_i < q_i < 2^63 guarantees that.
    """
    bp = base_extend_plan(qs, ps)
    q_arr = jnp.asarray(np.array(qs, dtype=np.uint64)[:, None])
    v = mul_shoup_v(
        u64(x), jnp.asarray(bp.q_hats_inv), jnp.asarray(bp.q_hats_inv_shoup), q_arr
    )  # (..., Lq, N)
    u_cnt = jnp.round(
        jnp.sum(v.astype(jnp.float64) * jnp.asarray(bp.q_fracs), axis=-2)
    ).astype(jnp.int64)  # (..., N)

    # out_j = sum_i hat_ij * v_i mod p_j: stacked (Lp, 1, 1) constants against
    # v broadcast over a new output-prime axis.
    p3 = jnp.asarray(bp.p_arr)[:, :, None]  # (Lp, 1, 1)
    terms = mul_mod_v(
        v[..., None, :, :],  # (..., 1, Lq, N)
        jnp.asarray(bp.q_hats_ps),  # (Lp, Lq, 1)
        p3,
        jnp.asarray(bp.neg_p_inv)[:, :, None],
        jnp.asarray(bp.p_r2)[:, :, None],
    )  # (..., Lp, Lq, N), each term < p_j
    lq, lp = len(qs), len(ps)
    p_arr = jnp.asarray(bp.p_arr)  # (Lp, 1)
    if lq * (max(ps) - 1) < (1 << 64):
        s = jnp.sum(terms, axis=-2)  # raw u64, no overflow
        # vectorized Barrett: r = s - floor(s/p)*p with two corrections
        hi = mulhi64(s, jnp.asarray(bp.p_barrett_m))
        r = s - hi * p_arr
        r = jnp.minimum(r, r - p_arr)
        s = jnp.minimum(r, r - p_arr)
    else:  # log-depth modular fold (unreachable for realistic bases)
        t = jnp.moveaxis(terms, -2, 0)
        while t.shape[0] > 1:
            m = t.shape[0]
            if m % 2:
                t = jnp.concatenate([t, jnp.zeros_like(t[:1])], axis=0)
                m += 1
            s2 = t[: m // 2] + t[m // 2 :]
            t = jnp.minimum(s2, s2 - p_arr)
        s = t[0]
    corr = jnp.moveaxis(jnp.asarray(bp.uq_ps_t)[u_cnt], -1, -2)  # (..., Lp, N)
    return sub_mod_v(s, corr, p_arr)


def barrett_all(v, p: int):
    from .modular import barrett_reduce_u64

    return barrett_reduce_u64(v, p)


def sub_mod_scalar(a, b, p: int):
    from .modular import sub_mod

    return sub_mod(a, b, p)


def switch_bases(x: jnp.ndarray, qs: tuple[int, ...], ps: tuple[int, ...]) -> jnp.ndarray:
    return extend_bases(x, qs, ps)


def rescale_k(x: jnp.ndarray, qs: tuple[int, ...], k: int) -> jnp.ndarray:
    """Divide-and-round by the product of the last k primes (`rns.rs:103-118`).

    x: (..., L, N) over qs; returns (..., L-k, N) over qs[:-k].
    """
    assert k > 0
    assert len(qs) > k, (
        f"rescale_k: cannot drop {k} of {len(qs)} limbs — level budget "
        f"exhausted (raise big_l / use fewer multiplies)"
    )
    keep = qs[:-k]
    drop = qs[-k:]
    p = 1
    for d in drop:
        p *= d
    # round: add p/2 to every limb (`rns.rs:120-125`)
    p_half_mod = np.array([(p >> 1) % q for q in qs], dtype=np.uint64)[:, None]
    q_arr = jnp.asarray(np.array(qs, dtype=np.uint64)[:, None])
    x = add_mod_v(u64(x), jnp.asarray(p_half_mod), q_arr)
    head, tail = x[..., : len(keep), :], x[..., len(keep) :, :]
    keep_q = jnp.asarray(np.array(keep, dtype=np.uint64)[:, None])
    if k == 1:
        # subtract the dropped limb's raw value from every kept limb
        rp = tail[..., 0, :]  # (..., N) values < drop[0]
        rp_mod = jnp.stack(
            [barrett_all(rp, q) if drop[0] >= q else rp for q in keep], axis=-2
        )
        head = sub_mod_v(head, rp_mod, keep_q)
    else:
        conv = switch_bases(tail, drop, keep)  # (..., L-k, N)
        head = sub_mod_v(head, conv, keep_q)
    # divide: multiply by p^-1 mod q (`rns.rs:127-132`)
    from .modular import shoup_precompute

    p_inv = np.array([mod_inverse(p % q, q) for q in keep], dtype=np.uint64)[:, None]
    p_inv_shoup = np.stack(
        [shoup_precompute(int(mod_inverse(p % q, q)), q) for q in keep]
    ).reshape(-1, 1)
    return mul_shoup_v(head, jnp.asarray(p_inv), jnp.asarray(p_inv_shoup), keep_q)
