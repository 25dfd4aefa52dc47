"""LMKCDEY blind-rotation bootstrapping (eprint 2022/198), TPU-native.

Reference: `scheme/fhew/src/bootstrapping.rs`. The flow (Figure 2 / Alg 3,
`bootstrapping.rs:148-209`):

    mod_switch(Q -> Q_ks) -> LWE key_switch (N -> n) -> mod_switch_odd(-> 2N)
    -> blind rotate (external products bucketed by dlog_g(a_i), automorphism
       every <= w steps) -> sample_extract(0)

TPU-first control-flow design (SURVEY.md §7.3 hard part 4): the reference's
blind-rotate inner loop is data-dependent Python-hostile branching, but the
LWE mask `a` is PUBLIC -- so the exact (ext-product | automorphism) step
sequence is computed on host per ciphertext as small index arrays, and the
device side is a single `lax.scan` over a padded, fixed-length schedule whose
body switches between three static branches. All keys live in evaluation
basis / Montgomery domain and are gathered per step by index.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import cached_property, partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ...ops.modular import add_mod, neg_mod, u64
from ...ops.poly import automorphism_map, automorphism_zq, monomial_mul_zq
from . import lwe, rgsw, rlwe
from .lwe import LweCiphertext, LweKeySwitchingKey
from .params import AUTO_G, LweParams, RgswParams, RlweParams
from .rgsw import RgswEval
from .rlwe import RlweCiphertext

OP_EXT, OP_AUTO, OP_NOOP = 0, 1, 2


@dataclass(frozen=True)
class BootstrapParams:
    """RGSW(big Q, N) + small LWE(q_ks, n) + window w (`bootstrapping.rs:21-90`)."""

    rgsw: RgswParams
    lwe_s: LweParams
    w: int
    # Gate-batch padding buckets (sorted, ascending). None = next power of two.
    # Coarse buckets (e.g. (16, 64)) collapse a circuit's many round sizes
    # onto 1-2 compiled pipeline shapes: each distinct batch is a full
    # recompile (~10 s via the remote helper, ARCHITECTURE §10), while padding
    # a latency-bound small round up to 16 cts costs almost nothing on-chip.
    gate_pad: tuple[int, ...] | None = None

    def __post_init__(self):
        assert self.rgsw.p == self.lwe_s.p

    @property
    def rlwe(self) -> RlweParams:
        return self.rgsw.rlwe

    @cached_property
    def lwe_z(self) -> LweParams:
        """Big-Q LWE view of the RLWE dimension (`bootstrapping.rs:42-44`)."""
        return LweParams(q=self.big_q, p=self.p, n=self.n)

    @property
    def p(self) -> int:
        return self.rgsw.p

    @property
    def n(self) -> int:
        return self.rgsw.n

    @property
    def big_q(self) -> int:
        return self.rgsw.q

    @property
    def big_q_ks(self) -> int:
        return self.lwe_s.q

    @property
    def q(self) -> int:
        return 2 * self.n

    @property
    def q_by_8(self) -> int:
        return self.q // 8

    @property
    def big_q_by_8(self) -> int:
        return round(self.big_q / 8.0)

    @property
    def big_q_by_4(self) -> int:
        return round(self.big_q / 4.0)

    @cached_property
    def ak_t(self) -> list[int]:
        """Automorphism exponents [-g, g, g^2, .., g^w] as centered i64
        (`bootstrapping.rs:86-90`)."""
        two_n = self.q
        g = AUTO_G % two_n

        def center(v):
            return v if v < two_n // 2 else v - two_n

        ts = [center((-g) % two_n)]
        acc = 1
        for _ in range(self.w):
            acc = acc * g % two_n
            ts.append(center(acc))
        return ts

    @cached_property
    def schedule_len(self) -> int:
        """Static padded schedule length: n ext products + <= n/2 + 2 autos."""
        return self.lwe_s.n + self.n // 2 + 2

    @cached_property
    def dlog_tables(self) -> tuple[np.ndarray, np.ndarray]:
        """value -> l maps for +-g^l mod 2N, -1 where undefined
        (`bootstrapping.rs:228-231`)."""
        two_n = self.q
        minus = np.full(two_n, -1, dtype=np.int64)
        plus = np.full(two_n, -1, dtype=np.int64)
        acc = 1
        for l in range(self.n // 2):
            plus[acc % two_n] = l
            minus[(-acc) % two_n] = l
            acc = acc * (AUTO_G % two_n) % two_n
        return minus, plus


class BootstrapKey(NamedTuple):
    """Device-resident key material, all evaluation-basis residency.

    For q < 2^31 the brk/ak values are u32 with Shoup duals; otherwise u64
    Montgomery with the dual fields None."""

    ksk_a: jnp.ndarray  # (d_ks, N, n) LWE key-switching key
    ksk_b: jnp.ndarray  # (d_ks, N)
    brk_a: jnp.ndarray  # (n, 2d, N) blind-rotation RGSW keys
    brk_b: jnp.ndarray  # (n, 2d, N)
    ak_a: jnp.ndarray  # (w+1, d, N) automorphism keys
    ak_b: jnp.ndarray  # (w+1, d, N)
    auto_src: jnp.ndarray  # (w+1, N) gather maps for X -> X^{t_v}
    auto_sign: jnp.ndarray  # (w+1, N) bool
    brk_ad: jnp.ndarray | None = None  # Shoup duals (u32 path)
    brk_bd: jnp.ndarray | None = None
    ak_ad: jnp.ndarray | None = None
    ak_bd: jnp.ndarray | None = None


def _monomial_poly(n: int, q: int, exps: np.ndarray) -> np.ndarray:
    """Host build of the polynomials X^{e_j}: (len(exps), N) u64."""
    out = np.zeros((len(exps), n), dtype=np.uint64)
    for j, e in enumerate(np.asarray(exps, dtype=np.int64)):
        i = int(e) % (2 * n)
        if i < n:
            out[j, i] = 1
        else:
            out[j, i - n] = q - 1
    return out


def key_gen(
    params: BootstrapParams, z: np.ndarray, rng: np.random.Generator
) -> BootstrapKey:
    """ksk: Q_ks LWE N->n; brk_j = RGSW(X^{s_j}); ak_v for t in ak_t
    (`bootstrapping.rs:121-146`)."""
    s = lwe.sk_gen(params.lwe_s, rng)
    ksk = lwe.ksk_gen(params.lwe_s, s, z, rng)
    brk_pt = jnp.asarray(_monomial_poly(params.n, params.big_q, s))  # (n, N)
    brk = rgsw.sk_encrypt_rgsw(params.rgsw, z, brk_pt, rng)  # (n, 2d, N)
    brk_eval = rgsw.to_eval(params.rgsw, brk)
    aks = [rlwe.ak_gen(params.rlwe, t, z, rng) for t in params.ak_t]
    return _pack_key(params, ksk, brk_eval, [ak.ksk for ak in aks])


def _pack_key(
    params: BootstrapParams,
    ksk: LweKeySwitchingKey,
    brk_eval: RgswEval,
    ak_ksks: list[rlwe.RlweKeySwitchingKey],
) -> BootstrapKey:
    ak_a = jnp.stack([k.a_eval for k in ak_ksks])
    ak_b = jnp.stack([k.b_eval for k in ak_ksks])
    u32 = params.rgsw.use_u32 and brk_eval.a_dual is not None
    srcs, signs = [], []
    for t in params.ak_t:
        src, sign = automorphism_map(params.n, t)
        srcs.append(src)
        signs.append(sign)
    return BootstrapKey(
        ksk_a=ksk.a,
        ksk_b=ksk.b,
        brk_a=brk_eval.a,
        brk_b=brk_eval.b,
        ak_a=ak_a,
        ak_b=ak_b,
        auto_src=jnp.asarray(np.stack(srcs)),
        auto_sign=jnp.asarray(np.stack(signs)),
        brk_ad=brk_eval.a_dual,
        brk_bd=brk_eval.b_dual,
        ak_ad=jnp.stack([k.a_dual for k in ak_ksks]) if u32 else None,
        ak_bd=jnp.stack([k.b_dual for k in ak_ksks]) if u32 else None,
    )


# -- host schedule construction (public data) ---------------------------------


def build_schedule(params: BootstrapParams, a: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Transcribe Alg 3's control flow over the public mask a (mod 2N) into a
    fixed-length (op, idx) array pair (`bootstrapping.rs:171-231`).

    a: (..., n) host u64 array with values already switched to Z_2N.
    Returns ops, idxs of shape (..., schedule_len) i32.
    """
    a = np.asarray(a, dtype=np.int64)

    # native transcription when the host library is built (identical output,
    # ~1000x faster on large gate batches)
    from ...utils.native import build_schedule as native_schedule

    minus_map, plus_map = params.dlog_tables
    native = native_schedule(
        a, minus_map, plus_map, params.n // 2, params.w, params.schedule_len
    )
    if native is not None:
        return native

    batch = a.shape[:-1]
    if batch:
        flat = a.reshape(-1, a.shape[-1])
        pairs = [build_schedule(params, row) for row in flat]
        ops = np.stack([p[0] for p in pairs]).reshape(*batch, -1)
        idxs = np.stack([p[1] for p in pairs]).reshape(*batch, -1)
        return ops, idxs

    minus_map, plus_map = params.dlog_tables
    half = params.n // 2
    i_minus = [[] for _ in range(half)]
    i_plus = [[] for _ in range(half)]
    for j, aj in enumerate(a):
        lm, lp = minus_map[aj], plus_map[aj]
        if lm >= 0 and lp < 0:
            i_minus[lm].append(j)
        elif lp >= 0 and lm < 0:
            i_plus[lp].append(j)
        elif aj == 0:
            pass
        else:
            raise AssertionError("value in both dlog tables")

    steps: list[tuple[int, int]] = []

    def walk(buckets):
        v = 0
        for l in range(len(buckets) - 1, 0, -1):
            for j in buckets[l]:
                steps.append((OP_EXT, j))
            v += 1
            if buckets[l - 1] or v == params.w or l == 1:
                steps.append((OP_AUTO, v))
                v = 0
        return v

    walk(i_minus)
    for j in i_minus[0]:
        steps.append((OP_EXT, j))
    steps.append((OP_AUTO, 0))  # ak[0]: t = -g
    walk(i_plus)
    for j in i_plus[0]:
        steps.append((OP_EXT, j))

    L = params.schedule_len
    assert len(steps) <= L, (len(steps), L)
    ops = np.full(L, OP_NOOP, dtype=np.int32)
    idxs = np.zeros(L, dtype=np.int32)
    for k, (op, idx) in enumerate(steps):
        ops[k] = op
        idxs[k] = idx
    return ops, idxs


def fuse_schedule(ops: np.ndarray, idxs: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Merge each automorphism into the preceding external-product step.

    Under a batched (vmapped) walk every step pays BOTH branch costs, so the
    step count is the cost: an (op, idx) stream of length L becomes a stream
    of (ext_idx, auto_idx) pairs (-1 = absent) of length ~0.6 L — each run of
    external products carries the auto that follows it for free, preserving
    the exact per-element op order (ext phase then auto phase per step).
    """
    ops2 = ops.reshape(-1, ops.shape[-1])
    idxs2 = idxs.reshape(-1, idxs.shape[-1])
    B, L = ops2.shape
    from ...utils import native as _native

    native_out = _native.fuse_schedule(ops2, idxs2)
    if native_out is not None:
        e_out, a_out, max_len = native_out
        L2 = _trim_len(max_len, L)
        shape = (*ops.shape[:-1], L2)
        return e_out[:, :L2].reshape(shape), a_out[:, :L2].reshape(shape)
    e_out = np.full((B, L), -1, dtype=np.int32)
    a_out = np.full((B, L), -1, dtype=np.int32)
    max_len = 0
    for b in range(B):
        k = 0  # next step to write; steps [0, k) finalized except maybe auto
        open_ext = False  # step k-1 is an ext with no auto attached yet
        for t in range(L):
            op = ops2[b, t]
            if op == OP_EXT:
                e_out[b, k] = idxs2[b, t]
                open_ext = True
                k += 1
            elif op == OP_AUTO:
                if open_ext:
                    a_out[b, k - 1] = idxs2[b, t]
                    open_ext = False
                else:
                    a_out[b, k] = idxs2[b, t]
                    k += 1
            else:  # NOOP padding: schedules pad only at the tail
                break
        max_len = max(max_len, k)
    L2 = _trim_len(max_len, L)
    shape = (*ops.shape[:-1], L2)
    return e_out[:, :L2].reshape(shape), a_out[:, :L2].reshape(shape)


def _trim_len(max_len: int, L: int) -> int:
    """Quantize the trimmed schedule length so the jit cache sees FEW distinct
    scan lengths: every distinct length is a full pipeline recompile (~30-60 s
    through the remote compile helper at production params), which dwarfs the
    cost of a few masked noop steps. Buckets of ~L/16 (min 32) put all
    realistic batches of one parameter set in 1-2 shapes. The inner max(5,..)
    is the 32 floor (this supersedes the old fixed 32-step quantization)."""
    step = 1 << max(5, L.bit_length() - 4)
    return max(1, min(L, -(-max_len // step) * step))


# -- device blind rotation -----------------------------------------------------


@partial(jax.jit, static_argnums=(0,))
def blind_rotate_core(
    params: BootstrapParams,
    key: BootstrapKey,
    ops: jnp.ndarray,
    idxs: jnp.ndarray,
    acc: RlweCiphertext,
) -> RlweCiphertext:
    """lax.scan over the padded schedule; each step gathers its key slice and
    switches between {external product, automorphism+keyswitch, noop}.
    When q < 2^31 the whole walk carries the accumulator on u32 lanes."""
    gp = params.rgsw
    rp = params.rlwe
    q = params.big_q
    u32 = gp.use_u32 and key.brk_ad is not None

    if u32:
        from ...ops.modular32 import neg_mod32

        neg = lambda x: neg_mod32(x, q)
    else:
        neg = lambda x: neg_mod(x, q)

    def ext_branch(carry, brk, _src, _sign, _ak):
        ct = RlweCiphertext(*carry)
        out = rgsw.external_product(gp, RgswEval(*brk), ct)
        return (out.a, out.b)

    def auto_branch(carry, _brk, src, sign, ak):
        a, b = carry
        a_g = a[..., src]
        b_g = b[..., src]
        a_auto = jnp.where(sign, neg(a_g), a_g)
        b_auto = jnp.where(sign, neg(b_g), b_g)
        out = rlwe.key_switch(
            rp, rlwe.RlweKeySwitchingKey(*ak), RlweCiphertext(a_auto, b_auto)
        )
        return (out.a, out.b)

    def noop_branch(carry, *_):
        return carry

    def step(carry, op_idx):
        op, idx = op_idx
        brk = (
            key.brk_a[idx],
            key.brk_b[idx],
            key.brk_ad[idx] if u32 else None,
            key.brk_bd[idx] if u32 else None,
        )
        ak = (
            key.ak_a[idx],
            key.ak_b[idx],
            key.ak_ad[idx] if u32 else None,
            key.ak_bd[idx] if u32 else None,
        )
        src = key.auto_src[idx]
        sign = key.auto_sign[idx]
        carry = jax.lax.switch(
            op, [ext_branch, auto_branch, noop_branch], carry, brk, src, sign, ak
        )
        return carry, None

    acc_a, acc_b = acc.a, acc.b
    if u32:
        acc_a = acc_a.astype(jnp.uint32)
        acc_b = acc_b.astype(jnp.uint32)
    (a, b), _ = jax.lax.scan(step, (acc_a, acc_b), (ops, idxs))
    if u32:
        a, b = u64(a), u64(b)
    return RlweCiphertext(a, b)


@partial(jax.jit, static_argnums=(0,))
def blind_rotate_core_fused(
    params: BootstrapParams,
    key: BootstrapKey,
    ext_idx: jnp.ndarray,  # (L,) i32, -1 = no external product this step
    auto_idx: jnp.ndarray,  # (L,) i32, -1 = no automorphism this step
    acc: RlweCiphertext,
) -> RlweCiphertext:
    """Fused-schedule walk (see `fuse_schedule`): every step runs a masked
    external product THEN a masked automorphism+keyswitch. Identical op
    order per element as `blind_rotate_core`, ~40% fewer scan steps."""
    gp = params.rgsw
    rp = params.rlwe
    q = params.big_q
    u32 = gp.use_u32 and key.brk_ad is not None

    if u32:
        from ...ops.modular32 import neg_mod32

        neg = lambda x: neg_mod32(x, q)
    else:
        neg = lambda x: neg_mod(x, q)

    def step(carry, inp):
        e_i, a_i = inp
        ct = RlweCiphertext(*carry)

        e_safe = jnp.maximum(e_i, 0)
        brk = RgswEval(
            key.brk_a[e_safe],
            key.brk_b[e_safe],
            key.brk_ad[e_safe] if u32 else None,
            key.brk_bd[e_safe] if u32 else None,
        )
        ext = rgsw.external_product(gp, brk, ct)
        keep = e_i >= 0
        ct = RlweCiphertext(
            jnp.where(keep, ext.a, ct.a), jnp.where(keep, ext.b, ct.b)
        )

        a_safe = jnp.maximum(a_i, 0)
        src = key.auto_src[a_safe]
        sign = key.auto_sign[a_safe]
        a_g = ct.a[..., src]
        b_g = ct.b[..., src]
        auto_in = RlweCiphertext(
            jnp.where(sign, neg(a_g), a_g), jnp.where(sign, neg(b_g), b_g)
        )
        ksk = rlwe.RlweKeySwitchingKey(
            key.ak_a[a_safe],
            key.ak_b[a_safe],
            key.ak_ad[a_safe] if u32 else None,
            key.ak_bd[a_safe] if u32 else None,
        )
        auto = rlwe.key_switch(rp, ksk, auto_in)
        keep = a_i >= 0
        ct = RlweCiphertext(
            jnp.where(keep, auto.a, ct.a), jnp.where(keep, auto.b, ct.b)
        )
        return (ct.a, ct.b), None

    acc_a, acc_b = acc.a, acc.b
    if u32:
        acc_a = acc_a.astype(jnp.uint32)
        acc_b = acc_b.astype(jnp.uint32)
    (a, b), _ = jax.lax.scan(step, (acc_a, acc_b), (ext_idx, auto_idx))
    if u32:
        a, b = u64(a), u64(b)
    return RlweCiphertext(a, b)


def blind_rotate(
    params: BootstrapParams,
    key: BootstrapKey,
    f: jnp.ndarray,
    ct: LweCiphertext,
) -> RlweCiphertext:
    """acc = (0, f o sigma_{-g} * X^{g*b}), then the core walk
    (`bootstrapping.rs:157-168`). ct is a host-materialized Z_2N ciphertext."""
    g = AUTO_G
    f_prime = automorphism_zq(u64(f), -g, params.big_q)
    b_g = (jnp.asarray(ct.b, dtype=jnp.int64) * g) % (2 * params.n)
    f_prime = monomial_mul_zq(f_prime, b_g, params.big_q)
    acc = RlweCiphertext(jnp.zeros_like(f_prime), f_prime)
    ops, idxs = build_schedule(params, np.asarray(ct.a))
    e_idx, a_idx = fuse_schedule(ops, idxs)
    return blind_rotate_core_fused(
        params, key, jnp.asarray(e_idx), jnp.asarray(a_idx), acc
    )


def bootstrap(
    params: BootstrapParams, key: BootstrapKey, f: jnp.ndarray, ct: LweCiphertext
) -> LweCiphertext:
    """Figure 2 of 2022/198 (`bootstrapping.rs:148-155`)."""
    ct = lwe.ct_mod_switch(ct, params.big_q, params.big_q_ks)
    ct = lwe.key_switch(params.lwe_s, LweKeySwitchingKey(key.ksk_a, key.ksk_b), ct)
    ct = lwe.ct_mod_switch_odd(ct, params.big_q_ks, params.q)
    acc = blind_rotate(params, key, f, ct)
    return rlwe.sample_extract(params.rlwe, acc, 0)


# -- multi-key / threshold (`bootstrapping.rs:233-321`) ------------------------


class BootstrapCrs(NamedTuple):
    pk_a: jnp.ndarray  # (N,)
    ksk_a: jnp.ndarray  # (d_ks, N, n)
    ak_a: jnp.ndarray  # (w+1, d, N)


class BootstrapKeyShare(NamedTuple):
    ksk_b: jnp.ndarray  # (d_ks, N)
    brk: rgsw.RgswCiphertext  # (n, 2d, N) pk-encrypted under merged pk
    ak_b: jnp.ndarray  # (w+1, d, N)


def crs_gen(params: BootstrapParams, rng: np.random.Generator) -> BootstrapCrs:
    from ...utils.distributions import uniform_zq

    pk_a = jnp.asarray(uniform_zq(params.big_q, rng, params.n))
    d_ks = params.lwe_s.gadget.d
    ksk_a = jnp.asarray(
        uniform_zq(params.big_q_ks, rng, (d_ks, params.n, params.lwe_s.n))
    )
    d = params.rlwe.gadget.d
    ak_a = jnp.asarray(
        uniform_zq(params.big_q, rng, (len(params.ak_t), d, params.n))
    )
    return BootstrapCrs(pk_a, ksk_a, ak_a)


def key_share_gen(
    params: BootstrapParams,
    crs: BootstrapCrs,
    z: np.ndarray,
    pk: RlweCiphertext,
    rng: np.random.Generator,
) -> BootstrapKeyShare:
    """Each party: LWE ksk share under crs, brk under the MERGED pk, ak shares
    (`bootstrapping.rs:271-293`)."""
    s = lwe.sk_gen(params.lwe_s, rng)
    ksk_b = lwe.ksk_share_gen(params.lwe_s, crs.ksk_a, s, z, rng)
    brk_pt = jnp.asarray(_monomial_poly(params.n, params.big_q, s))
    brk = rgsw.pk_encrypt_rgsw(params.rgsw, pk, brk_pt, rng)
    ak_b = jnp.stack(
        [
            rlwe.ak_share_gen(params.rlwe, t, crs.ak_a[i], z, rng)
            for i, t in enumerate(params.ak_t)
        ]
    )
    return BootstrapKeyShare(ksk_b, brk, ak_b)


def merge_chunk_size(n_keys: int, target: int = 64) -> int:
    """Internal-product merge chunk width chosen so the whole merge compiles
    as FEW program shapes as possible (prewarmed in models/fhew/warmup.py):
    the largest divisor of n_keys <= target (one shape exactly, e.g.
    600 -> 10x60), falling back to ceil-equalized widths when n_keys has no
    usable divisor (at most two shapes)."""
    if n_keys <= target:
        return max(1, n_keys)
    for c in range(target, max(1, target // 2) - 1, -1):
        if n_keys % c == 0:
            return c
    n_chunks = -(-n_keys // target)
    return -(-n_keys // n_chunks)


@partial(jax.jit, static_argnums=(0,))
def _merge_chunk(rgsw_params, merged_a, merged_b, share_a, share_b):
    """One jitted program per chunk shape: the eager per-op dispatch of the
    internal-product pipeline cost ~hundreds of tiny remote compiles before
    this wrapper existed (every device op must live inside a params-static
    jit — CLAUDE.md rule 1, measured again here)."""
    key_ev = rgsw.to_eval(rgsw_params, rgsw.RgswCiphertext(merged_a, merged_b))
    out = rgsw.internal_product(
        rgsw_params, key_ev, rgsw.RgswCiphertext(share_a, share_b)
    )
    return out.a, out.b


def key_share_merge(
    params: BootstrapParams,
    crs: BootstrapCrs,
    shares: list[BootstrapKeyShare],
) -> BootstrapKey:
    """ksk/ak shares sum; brk shares fold through RGSW internal products
    (`bootstrapping.rs:295-321`)."""
    ksk = lwe.ksk_share_merge(
        params.lwe_s, crs.ksk_a, (s.ksk_b for s in shares)
    )
    merged = shares[0].brk
    for s in shares[1:]:
        # chunk the n-axis: each LWE key bit's RGSW merges independently, and
        # a full-width internal product at production sizes (n=600, N=2^11,
        # d=5, 55-bit q) materializes multi-GB u64 intermediates. Equalize
        # the chunks so every slice shares ONE compiled shape (600 -> 10x60,
        # not 9x64 + 24 with a second cold compile for the ragged tail).
        n_keys = merged.a.shape[0]
        chunk = merge_chunk_size(n_keys)
        outs = []
        for lo in range(0, n_keys, chunk):
            hi = lo + chunk
            outs.append(
                _merge_chunk(
                    params.rgsw,
                    merged.a[lo:hi],
                    merged.b[lo:hi],
                    s.brk.a[lo:hi],
                    s.brk.b[lo:hi],
                )
            )
        merged = rgsw.RgswCiphertext(
            jnp.concatenate([o[0] for o in outs], axis=0),
            jnp.concatenate([o[1] for o in outs], axis=0),
        )
    brk_eval = rgsw.to_eval(params.rgsw, merged)
    ak_ksks = []
    for i, t in enumerate(params.ak_t):
        ak = rlwe.ak_share_merge(
            params.rlwe, t, crs.ak_a[i], (s.ak_b[i] for s in shares)
        )
        ak_ksks.append(ak.ksk)
    return _pack_key(params, ksk, brk_eval, ak_ksks)
