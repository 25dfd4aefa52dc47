"""BGV: exact leveled arithmetic over Z_t with SIMD slot packing.

BEYOND the reference (it implements CKKS/TFHE/FHEW only): BGV completes the
classic scheme trio — exact modular integer arithmetic with CKKS-style
levels — and reuses this repo's whole substrate: stacked-limb RNS arrays
(`ops/rns.py`), the u32 NTT for plaintext slot packing (`ops/ntt32.py`),
hybrid P·sk' key switching in evaluation residency, and the same
level-as-static-metadata jit discipline as `models/ckks/ckks.py`.

Scheme shape (BGV '12 / GHS '12, RNS form):

- phase(ct) = b + a·s = m + t·e (mod Q): the plaintext m in R_t rides the
  LOW bits; noise is scaled by t.
- Modulus switching drops the last RNS limb EXACTLY: subtract the unique
  correction d with d ≡ x (mod q_last), d ≡ 0 (mod t), |d| <= q_last·t/2,
  then divide. The phase maps to phase·q_last^{-1} mod t, so ciphertexts
  carry a plaintext `factor` (the accumulated q^{-1} mod t) that decrypt
  undoes — the standard BGV scale-tracking trick.
- Key switching is the CKKS hybrid (extend to QP, multiply eval-resident
  ksk = enc(P·sk'), divide P away) with the division t-corrected per p-limb
  so exactness mod t survives; the P factors cancel, leaving `factor`
  untouched.
- SIMD: t = 65537 (prime, t-1 = 2^16) splits R_t into N linear slots at the
  odd powers of a primitive 2N-th root; encode/decode are u32 NTTs mod t in
  power-of-5 slot order, so `rotate` (automorphism X -> X^{5^j} + key
  switch) cyclically rotates each of the two length-N/2 slot rows, exactly
  like CKKS rotations.

Exactness caveats (documented, not hidden): the base extension inside key
switching uses the reference's float overflow-count correction
(`rns.rs:339-344`), exact unless a coefficient lands within f64 rounding of
a half-integer boundary (~2^-40/coefficient); the t-corrected limb drops and
all other paths are exact integer arithmetic. Primes are capped at 46 bits
so the t-correction products stay on i64 lanes (t·q < 2^63).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import cached_property, lru_cache, partial
from itertools import islice

import jax
import jax.numpy as jnp
import numpy as np

from ...ops.modular import shoup_precompute, u64
from ...ops.ntt32 import ntt32_plan
from ...ops.poly import automorphism_map
from ...ops.rns import (
    extend_bases,
    mul_shoup_v,
    neg_mod_v,
    rns_add,
    rns_from_i64,
    rns_intt,
    rns_mul,
    rns_mul_eval,
    rns_neg,
    rns_ntt,
    rns_plan,
    rns_sub,
    sub_mod_v,
)
from ...utils.crt import rns_to_bigints
from ...utils.distributions import dg, uniform_zq, zo
from ...utils.primes import mod_inverse, two_adic_primes


@dataclass(frozen=True)
class BgvParams:
    """big_l q-primes + big_l auxiliary p-primes (hybrid ksk), one descending
    two-adic stream, like CkksParams; t is the plaintext modulus (prime,
    2N | t-1 so R_t splits into N slots)."""

    log_n: int
    t: int = 65537
    log_qi: int = 45
    big_l: int = 4

    def __post_init__(self):
        assert self.log_n >= 1 and self.big_l > 1
        assert self.log_qi <= 46, "t-correction products must fit i64 lanes"
        assert (self.t - 1) % (2 << self.log_n) == 0, (
            "need 2N | t-1 for SIMD slots"
        )

    @cached_property
    def qs(self) -> tuple[int, ...]:
        return tuple(islice(two_adic_primes(self.log_qi, self.log_n + 1), self.big_l))

    @cached_property
    def ps(self) -> tuple[int, ...]:
        it = two_adic_primes(self.log_qi, self.log_n + 1)
        return tuple(islice(it, self.big_l, 2 * self.big_l))

    @property
    def qps(self) -> tuple[int, ...]:
        return self.qs + self.ps

    @property
    def n(self) -> int:
        return 1 << self.log_n

    @cached_property
    def big_p(self) -> int:
        out = 1
        for p in self.ps:
            out *= p
        return out

    def pow5(self, j: int) -> int:
        return pow(5, j, 2 * self.n)

    def plan(self, qs: tuple[int, ...]):
        return rns_plan(qs, self.n)


@partial(
    jax.tree_util.register_dataclass,
    data_fields=("b", "a"),
    meta_fields=("qs", "factor"),
)
@dataclass(frozen=True)
class BgvCiphertext:
    b: jnp.ndarray  # (L, N) u64
    a: jnp.ndarray
    qs: tuple  # static level metadata
    factor: int = 1  # accumulated q^{-1} mod t applied to the plaintext


@partial(
    jax.tree_util.register_dataclass, data_fields=("b", "a"), meta_fields=("qs",)
)
@dataclass(frozen=True)
class BgvKeySwitchingKey:
    """enc_{QP}(P * sk') in evaluation residency (see CkksKeySwitchingKey)."""

    b: jnp.ndarray  # (2L, N) NTT domain
    a: jnp.ndarray
    qs: tuple


@partial(jax.tree_util.register_dataclass, data_fields=("ksk",), meta_fields=("j",))
@dataclass(frozen=True)
class BgvRotKey:
    ksk: BgvKeySwitchingKey
    j: int


# -- exact t-corrected limb drop (the BGV mod-switch primitive) -----------------


@lru_cache(maxsize=None)
class _DropPlan:
    """Host tables for dropping the last limb of basis qs with plaintext
    modulus t: the correction d = centered(x mod q_l) + q_l·k with
    d ≡ 0 mod t, then exact division by q_l on the kept limbs."""

    def __init__(self, qs: tuple, t: int):
        ql = qs[-1]
        keep = qs[:-1]
        self.ql = ql
        self.t = t
        self.inv_ql_t = mod_inverse(ql % t, t)
        self.keep_arr = np.array(keep, dtype=np.int64)[:, None]  # (L-1, 1)
        self.ql_mod_keep = np.array([ql % q for q in keep], dtype=np.int64)[:, None]
        self.keep_q = np.array(keep, dtype=np.uint64)[:, None]
        inv = [mod_inverse(ql % q, q) for q in keep]
        self.ql_inv = np.array(inv, dtype=np.uint64)[:, None]
        self.ql_inv_shoup = np.stack(
            [shoup_precompute(v, q) for v, q in zip(inv, keep)]
        ).reshape(-1, 1)


def _drop_limb(x: jnp.ndarray, qs: tuple, t: int) -> jnp.ndarray:
    """x (..., L, N) over qs -> (..., L-1, N) over qs[:-1], computing exactly
    (x - d)/q_last with d ≡ x (mod q_last), d ≡ 0 (mod t)."""
    dp = _DropPlan(qs, t)
    ql = dp.ql
    r = x[..., -1, :].astype(jnp.int64)  # in [0, ql)
    rc = jnp.where(r > ql // 2, r - ql, r)  # centered, |rc| <= ql/2
    rm = jnp.mod(rc, t)  # in [0, t)
    k = jnp.mod((t - rm) * dp.inv_ql_t, t)
    kc = jnp.where(k > t // 2, k - t, k)  # |kc| <= t/2
    # d mod q_i, all on i64 lanes: |rc mod q_i| < q_i, |q_l%q_i * kc| <= q_i*t/2
    d_mod = jnp.mod(
        jnp.mod(rc[..., None, :], jnp.asarray(dp.keep_arr))
        + jnp.asarray(dp.ql_mod_keep) * kc[..., None, :],
        jnp.asarray(dp.keep_arr),
    ).astype(jnp.uint64)
    keep_q = jnp.asarray(dp.keep_q)
    num = sub_mod_v(u64(x[..., :-1, :]), d_mod, keep_q)
    return mul_shoup_v(num, jnp.asarray(dp.ql_inv), jnp.asarray(dp.ql_inv_shoup), keep_q)


@partial(jax.jit, static_argnums=(0, 1))
def _mod_switch_arrays(qs: tuple, t: int, b, a):
    return _drop_limb(b, qs, t), _drop_limb(a, qs, t)


def mod_switch(params: BgvParams, ct: BgvCiphertext) -> BgvCiphertext:
    """Drop the last q limb: noise shrinks ~q_last-fold (plus the additive
    t·||s||-sized correction term), plaintext factor gains q_last^{-1}."""
    b, a = _mod_switch_arrays(ct.qs, params.t, ct.b, ct.a)
    f = ct.factor * mod_inverse(ct.qs[-1] % params.t, params.t) % params.t
    return BgvCiphertext(b, a, ct.qs[:-1], f)


# -- keygen ---------------------------------------------------------------------


def sk_gen(params: BgvParams, rng: np.random.Generator) -> np.ndarray:
    return zo(0.5, rng, params.n)


def _sk_square(sk: np.ndarray) -> np.ndarray:
    n = len(sk)
    full = np.convolve(sk.astype(np.int64), sk.astype(np.int64))
    lo = full[:n].copy()
    hi = np.zeros(n, dtype=np.int64)
    hi[: n - 1] = full[n:]
    return lo - hi


def _automorphism_i64(sk: np.ndarray, j: int) -> np.ndarray:
    n = len(sk)
    src, sign = automorphism_map(n, j)
    out = sk[src].copy()
    out[sign] = -out[sign]
    return out


@partial(jax.jit, static_argnums=(0, 1))
def _sk_encrypt_core(params: BgvParams, qs: tuple, a, e_i64, sk_i64, pt):
    """b = -(a*s) + t*e + pt over basis qs."""
    plan = rns_plan(qs, a.shape[-1])
    e = rns_from_i64(e_i64 * np.int64(params.t), plan)
    sk_rns = rns_from_i64(sk_i64, plan)
    return rns_add(rns_add(rns_neg(rns_mul(a, sk_rns, plan), plan), e, plan), pt, plan)


def sk_encrypt(
    params: BgvParams,
    sk: np.ndarray,
    pt: jnp.ndarray,
    qs: tuple,
    rng: np.random.Generator,
) -> BgvCiphertext:
    a = jnp.asarray(np.stack([uniform_zq(q, rng, params.n) for q in qs]))
    e = jnp.asarray(dg(3.2, 6, rng, params.n))
    sk_i64 = jnp.asarray(np.asarray(sk, dtype=np.int64))
    b = _sk_encrypt_core(params, qs, a, e, sk_i64, pt)
    return BgvCiphertext(b, a, qs)


def pk_gen(params: BgvParams, sk: np.ndarray, rng: np.random.Generator) -> BgvCiphertext:
    zero = jnp.zeros((len(params.qs), params.n), dtype=jnp.uint64)
    return sk_encrypt(params, sk, zero, params.qs, rng)


@partial(jax.jit, static_argnums=(0, 1))
def _pk_encrypt_core(params: BgvParams, qs: tuple, pk_b, pk_a, u_i64, e0, e1, pt):
    plan = rns_plan(qs, pk_a.shape[-1])
    u = rns_from_i64(u_i64, plan)
    te0 = rns_from_i64(e0 * np.int64(params.t), plan)
    te1 = rns_from_i64(e1 * np.int64(params.t), plan)
    a = rns_add(rns_mul(pk_a, u, plan), te0, plan)
    b = rns_add(rns_add(rns_mul(pk_b, u, plan), te1, plan), pt, plan)
    return b, a


def pk_encrypt(
    params: BgvParams, pk: BgvCiphertext, pt: jnp.ndarray, rng: np.random.Generator
) -> BgvCiphertext:
    qs = pk.qs
    u = jnp.asarray(zo(0.5, rng, params.n))
    e0 = jnp.asarray(dg(3.2, 6, rng, params.n))
    e1 = jnp.asarray(dg(3.2, 6, rng, params.n))
    b, a = _pk_encrypt_core(params, qs, pk.b, pk.a, u, e0, e1, pt)
    return BgvCiphertext(b, a, qs)


@partial(jax.jit, static_argnums=(0,))
def _ksk_pt(params: BgvParams, sk_prime_i64: jnp.ndarray) -> jnp.ndarray:
    qps = params.qps
    plan = params.plan(qps)
    pt = rns_from_i64(sk_prime_i64, plan)
    p_mod = np.array([params.big_p % q for q in qps], dtype=np.uint64)[:, None]
    p_shoup = np.stack(
        [shoup_precompute(params.big_p % q, q) for q in qps]
    ).reshape(-1, 1)
    return mul_shoup_v(pt, p_mod, p_shoup, plan.q_arr)


def ksk_gen(
    params: BgvParams, sk: np.ndarray, sk_prime: np.ndarray, rng: np.random.Generator
) -> BgvKeySwitchingKey:
    pt = _ksk_pt(params, jnp.asarray(np.asarray(sk_prime, dtype=np.int64)))
    ct = sk_encrypt(params, sk, pt, params.qps, rng)
    plan = params.plan(params.qps)
    return BgvKeySwitchingKey(rns_ntt(ct.b, plan), rns_ntt(ct.a, plan), params.qps)


def rlk_gen(params: BgvParams, sk: np.ndarray, rng) -> BgvKeySwitchingKey:
    return ksk_gen(params, sk, _sk_square(sk), rng)


def rtk_gen(params: BgvParams, sk: np.ndarray, j: int, rng) -> BgvRotKey:
    assert j % (params.n // 2) != 0
    j = j % (params.n // 2)
    return BgvRotKey(ksk_gen(params, sk, _automorphism_i64(sk, params.pow5(j)), rng), j)


def cjk_gen(params: BgvParams, sk: np.ndarray, rng) -> BgvKeySwitchingKey:
    return ksk_gen(params, sk, _automorphism_i64(sk, -1), rng)


# -- encode / decode -------------------------------------------------------------


def _bitrev(k: int, bits: int) -> int:
    r = 0
    for b in range(bits):
        r |= ((k >> b) & 1) << (bits - 1 - b)
    return r


@lru_cache(maxsize=None)
def _slot_order(t: int, n: int, log_n: int) -> np.ndarray:
    """Slot j -> eval position, in power-of-5 order: rows j < n/2 at
    exponents 5^j mod 2n, rows j >= n/2 at -5^j — so the automorphism
    X -> X^{5^v} rotates each half cyclically (like CKKS slots).

    The merged-twist DIT transform (2016/504 Alg 1) evaluates position k at
    psi^{2*bitrev(k)+1}; the slot tests pin this relation end-to-end (a wrong
    exponent map would break the rotation tests, not just reorder slots)."""
    pos = {(2 * _bitrev(k, log_n) + 1) % (2 * n): k for k in range(n)}
    order = np.empty(n, dtype=np.int64)
    half = n // 2
    for r in range(half):
        e5 = pow(5, r, 2 * n)
        order[r] = pos[e5]
        order[half + r] = pos[2 * n - e5]
    return order


def _host_ntt_t(x: np.ndarray, t: int, n: int) -> np.ndarray:
    """Host NumPy radix-2 merged-twist NTT mod t over the last axis — the
    same butterflies as ops/ntt32.py but with no device dispatch, so
    encode/decode never issue eager ops through the TPU tunnel."""
    plan = ntt32_plan(t, n)
    psi = plan.psi_br.astype(np.uint64)
    out = x.astype(np.uint64) % t
    log_n = n.bit_length() - 1
    for l in range(log_n):
        m, half = 1 << l, n >> (l + 1)
        v = out.reshape(*x.shape[:-1], m, 2, half)
        u_, w_ = v[..., 0, :], v[..., 1, :]
        tw = psi[m : 2 * m][:, None]
        tv = (w_ * tw) % t
        out = np.stack(
            [(u_ + tv) % t, (u_ + (t - tv)) % t], axis=-2
        ).reshape(x.shape)
    return out


def _host_intt_t(x: np.ndarray, t: int, n: int) -> np.ndarray:
    plan = ntt32_plan(t, n)
    psi_inv = plan.psi_inv_br.astype(np.uint64)
    out = x.astype(np.uint64) % t
    log_n = n.bit_length() - 1
    for l in range(log_n - 1, -1, -1):
        m, half = 1 << l, n >> (l + 1)
        v = out.reshape(*x.shape[:-1], m, 2, half)
        u_, w_ = v[..., 0, :], v[..., 1, :]
        tw = psi_inv[m : 2 * m][:, None]
        s = (u_ + w_) % t
        dd = ((u_ + (t - w_)) % t * tw) % t
        out = np.stack([s, dd], axis=-2).reshape(x.shape)
    return (out * np.uint64(plan.n_inv)) % t


def encode(params: BgvParams, m: np.ndarray) -> jnp.ndarray:
    """Slot values (..., N) ints in [0, t) -> RNS plaintext (..., L_top, N)
    (use with encrypt at params.qs; to_level/limb-slicing handles lower)."""
    m = np.asarray(m)
    assert m.shape[-1] == params.n
    order = _slot_order(params.t, params.n, params.log_n)
    ev = np.zeros(m.shape, dtype=np.uint64)
    ev[..., order] = m.astype(np.uint64) % params.t
    coeffs = _host_intt_t(ev, params.t, params.n)
    return rns_from_i64(
        jnp.asarray(coeffs.astype(np.int64)), params.plan(params.qs)
    )


def encode_coeffs(params: BgvParams, m: np.ndarray) -> jnp.ndarray:
    """Coefficient encoding (no slot transform)."""
    return rns_from_i64(
        jnp.asarray(np.asarray(m, dtype=np.int64)), params.plan(params.qs)
    )


@partial(jax.jit, static_argnums=(0, 1))
def _decrypt_core(params: BgvParams, qs: tuple, b, a, sk_i64):
    plan = params.plan(qs)
    sk_rns = rns_from_i64(sk_i64, plan)
    return rns_add(b, rns_mul(a, sk_rns, plan), plan)


def _phase_mod_t(phase: np.ndarray, qs: tuple, t: int) -> np.ndarray:
    """Centered CRT lift mod t (host, exact big ints). Supports leading
    batch axes by looping on host (decrypt is a host endpoint)."""
    phase = np.asarray(phase)
    lead = phase.shape[:-2]
    flat = phase.reshape((-1,) + phase.shape[-2:])
    outs = []
    for sl in flat:
        vals = rns_to_bigints(sl, qs)  # centered Python ints
        outs.append(np.array([v % t for v in vals], dtype=np.int64))
    return np.stack(outs).reshape(lead + (phase.shape[-1],))


def decrypt_coeffs(params: BgvParams, sk: np.ndarray, ct: BgvCiphertext) -> np.ndarray:
    phase = _decrypt_core(
        params, ct.qs, ct.b, ct.a, jnp.asarray(np.asarray(sk, dtype=np.int64))
    )
    m = _phase_mod_t(np.asarray(phase), ct.qs, params.t)
    if ct.factor != 1:
        m = (m * mod_inverse(ct.factor, params.t)) % params.t
    return m


def decrypt(params: BgvParams, sk: np.ndarray, ct: BgvCiphertext) -> np.ndarray:
    """Decrypt to slot values (..., N) in [0, t)."""
    coeffs = decrypt_coeffs(params, sk, ct)
    order = _slot_order(params.t, params.n, params.log_n)
    ev = _host_ntt_t(coeffs % params.t, params.t, params.n)
    return ev[..., order].astype(np.int64)


# -- homomorphic ops --------------------------------------------------------------


def to_level(ct: BgvCiphertext, qs: tuple) -> BgvCiphertext:
    """Limb-intersection drop WITHOUT division — unlike CKKS this changes the
    BGV invariant, so it is only valid on FRESH encryptions (phase unchanged
    mod the smaller Q as long as |phase| < Q'/2). Prefer mod_switch."""
    if ct.qs == qs:
        return ct
    idx = [ct.qs.index(q) for q in qs]
    return BgvCiphertext(ct.b[..., idx, :], ct.a[..., idx, :], qs, ct.factor)


def _align(ct0: BgvCiphertext, ct1: BgvCiphertext):
    assert ct0.qs == ct1.qs, "mod_switch operands to a common level first"
    assert ct0.factor == ct1.factor, "plaintext factors must match for add/sub"
    return ct0.qs


@partial(jax.jit, static_argnums=(0,))
def _add_arrays(qs: tuple, b0, a0, b1, a1):
    plan = rns_plan(qs, b0.shape[-1])
    return rns_add(b0, b1, plan), rns_add(a0, a1, plan)


@partial(jax.jit, static_argnums=(0,))
def _sub_arrays(qs: tuple, b0, a0, b1, a1):
    plan = rns_plan(qs, b0.shape[-1])
    return rns_sub(b0, b1, plan), rns_sub(a0, a1, plan)


def add(ct0: BgvCiphertext, ct1: BgvCiphertext) -> BgvCiphertext:
    # jits key on qs only: the plaintext factor must NOT be a jit static
    # (every distinct factor value would recompile)
    qs = _align(ct0, ct1)
    b, a = _add_arrays(qs, ct0.b, ct0.a, ct1.b, ct1.a)
    return BgvCiphertext(b, a, qs, ct0.factor)


def sub(ct0: BgvCiphertext, ct1: BgvCiphertext) -> BgvCiphertext:
    qs = _align(ct0, ct1)
    b, a = _sub_arrays(qs, ct0.b, ct0.a, ct1.b, ct1.a)
    return BgvCiphertext(b, a, qs, ct0.factor)


@partial(jax.jit, static_argnums=(0, 1))
def _key_switch_arrays(params: BgvParams, qs: tuple, ksk_b, ksk_a, d2):
    """(0, d2) -> hybrid-switched (b, a) over qs, with the P division done by
    exact t-corrected limb drops (phase gains no factor: P cancels)."""
    ps = params.ps
    qps = qs + ps
    plan = params.plan(qps)
    d2_ext = jnp.concatenate([d2, extend_bases(d2, qs, ps)], axis=-2)
    d2_eval = rns_ntt(d2_ext, plan)
    idx = [params.qps.index(q) for q in qps]
    b = rns_intt(rns_mul_eval(ksk_b[idx, :], d2_eval, plan), plan)
    a = rns_intt(rns_mul_eval(ksk_a[idx, :], d2_eval, plan), plan)
    basis = qps
    for _ in range(len(ps)):
        b = _drop_limb(b, basis, params.t)
        a = _drop_limb(a, basis, params.t)
        basis = basis[:-1]
    return b, a


def key_switch(
    params: BgvParams, ksk: BgvKeySwitchingKey, ct: BgvCiphertext
) -> BgvCiphertext:
    """Switch (b, a) under sk' to under sk (a-part through the ksk)."""
    b2, a2 = _key_switch_arrays(params, ct.qs, ksk.b, ksk.a, ct.a)
    plan = params.plan(ct.qs)
    return BgvCiphertext(rns_add(ct.b, b2, plan), a2, ct.qs, ct.factor)


@partial(jax.jit, static_argnums=(0, 1))
def _mul_core(params: BgvParams, qs: tuple, ksk_b, ksk_a, b0, a0, b1, a1):
    plan = params.plan(qs)
    eb0, ea0 = rns_ntt(b0, plan), rns_ntt(a0, plan)
    eb1, ea1 = rns_ntt(b1, plan), rns_ntt(a1, plan)
    d0 = rns_intt(rns_mul_eval(eb0, eb1, plan), plan)
    d1 = rns_intt(
        rns_add(rns_mul_eval(eb0, ea1, plan), rns_mul_eval(ea0, eb1, plan), plan),
        plan,
    )
    d2 = rns_intt(rns_mul_eval(ea0, ea1, plan), plan)
    rb, ra = _key_switch_arrays(params, qs, ksk_b, ksk_a, d2)
    b = rns_add(d0, rb, plan)
    a = rns_add(d1, ra, plan)
    # mod-switch one limb to tame the product noise
    return _drop_limb(b, qs, params.t), _drop_limb(a, qs, params.t)


def mul(
    params: BgvParams, rlk: BgvKeySwitchingKey, ct0: BgvCiphertext, ct1: BgvCiphertext
) -> BgvCiphertext:
    """Tensor + relinearize + mod-switch. Output factor = f0*f1*q_last^{-1}."""
    assert ct0.qs == ct1.qs, "mod_switch operands to a common level first"
    qs = ct0.qs
    b, a = _mul_core(params, qs, rlk.b, rlk.a, ct0.b, ct0.a, ct1.b, ct1.a)
    f = (
        ct0.factor * ct1.factor * mod_inverse(qs[-1] % params.t, params.t)
    ) % params.t
    return BgvCiphertext(b, a, qs[:-1], f)


def mul_plain(params: BgvParams, m: np.ndarray, ct: BgvCiphertext) -> BgvCiphertext:
    """ct * encode(m): no relinearization, no level change, factor unchanged."""
    pt = encode(params, m)[..., : len(ct.qs), :]
    plan = params.plan(ct.qs)
    return BgvCiphertext(
        rns_mul(pt, ct.b, plan), rns_mul(pt, ct.a, plan), ct.qs, ct.factor
    )


def add_plain(params: BgvParams, m: np.ndarray, ct: BgvCiphertext) -> BgvCiphertext:
    """ct + encode(m), compensating the ciphertext's plaintext factor."""
    m_adj = (np.asarray(m, dtype=np.int64) * ct.factor) % params.t
    pt = encode(params, m_adj)[..., : len(ct.qs), :]
    plan = params.plan(ct.qs)
    return BgvCiphertext(rns_add(ct.b, pt, plan), ct.a, ct.qs, ct.factor)


def _automorphism_rns(x: jnp.ndarray, j: int, qs: tuple) -> jnp.ndarray:
    n = x.shape[-1]
    src, sign = automorphism_map(n, j)
    g = u64(x)[..., src]
    q_arr = jnp.asarray(np.array(qs, dtype=np.uint64)[:, None])
    return jnp.where(jnp.asarray(sign), neg_mod_v(g, q_arr), g)


@partial(jax.jit, static_argnums=(0, 1, 2))
def _auto_ks_arrays(params: BgvParams, qs: tuple, t5: int, ksk_b, ksk_a, b, a):
    """Automorphism X -> X^{t5} + key switch, fused in one program."""
    mb = _automorphism_rns(b, t5, qs)
    ma = _automorphism_rns(a, t5, qs)
    b2, a2 = _key_switch_arrays(params, qs, ksk_b, ksk_a, ma)
    return rns_add(mb, b2, params.plan(qs)), a2


def rotate(params: BgvParams, rtk: BgvRotKey, ct: BgvCiphertext) -> BgvCiphertext:
    """Rotate each length-N/2 slot row left by rtk.j (decode[r] <- old r+j)."""
    b, a = _auto_ks_arrays(
        params, ct.qs, params.pow5(rtk.j), rtk.ksk.b, rtk.ksk.a, ct.b, ct.a
    )
    return BgvCiphertext(b, a, ct.qs, ct.factor)


def conjugate(params: BgvParams, cjk: BgvKeySwitchingKey, ct: BgvCiphertext) -> BgvCiphertext:
    """Swap the two slot rows (the automorphism X -> X^{-1})."""
    b, a = _auto_ks_arrays(params, ct.qs, -1, cjk.b, cjk.a, ct.b, ct.a)
    return BgvCiphertext(b, a, ct.qs, ct.factor)
