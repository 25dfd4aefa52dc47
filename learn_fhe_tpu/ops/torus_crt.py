"""Exact negacyclic torus (Z/2^64) polynomial products via multi-prime u32
CRT NTTs — the TPU-native fast path for TFHE's blind rotation.

The reference multiplies torus polynomials through a complex f64 FFT
(`util/src/ring/fft/c64.rs`); f64 is emulated on TPU. `ops/torus_ntt.py`
replaced that with a 2x51-bit-prime CRT over emulated u64 lanes; this module
is the second redesign: k primes < 2^31 so every butterfly runs on native
32-bit vector lanes (one mulhi32 + two low muls per Shoup multiply), measured
~20x faster per transform than the u64 path on v5e.

Exactness: the integer negacyclic product (including a row-contraction of R
gadget rows in evaluation basis) is recovered exactly mod 2^64 whenever
|coefficient| <= 2^(bound_bits-1) < Q/2 with Q = prod(primes); digits are
bounded by 2^(log_b-1) and torus operands by 2^63, so
bound_bits = 1 + log2(R) + log_n + (log_b-1) + 63 (see `required_bound_bits`).
Reconstruction is a Garner mixed-radix walk (all-constant Shoup multiplies)
with a lexicographic compare against Q/2 for the centered lift.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import lru_cache

import jax.numpy as jnp
import numpy as np

from ..utils.primes import mod_inverse, two_adic_primes
from .modular32 import (
    i64_to_mod32,
    mul_mod32,
    mul_shoup32,
    shoup32,
    small_i64_to_mod32,
    small_u32_to_mod32,
    sub_mod32,
    u32,
)
from .ntt32 import Ntt32Plan, intt32, ntt32, ntt32_plan

_PRIME_BITS = 31
_MAX_LOG_N = 14


def required_bound_bits(n: int, log_b: int, rows: int) -> int:
    """Bits of the worst-case |coefficient| of a row-contracted digit*torus
    negacyclic product: rows * n * 2^(log_b-1) * 2^63."""
    return 1 + (rows - 1).bit_length() + (n - 1).bit_length() + (log_b - 1) + 63


@dataclass(frozen=True, eq=False)
class TorusCrtPlan:
    n: int
    primes: tuple[int, ...]
    plans: tuple[Ntt32Plan, ...]
    # Garner tables: inv_shoup[i][j] = Shoup pair of q_j^-1 mod q_i (j < i)
    garner_inv: tuple[tuple[tuple[int, int], ...], ...]
    half_digits: tuple[int, ...]  # mixed-radix digits of (Q-1)//2
    q_mod_2_64: int  # Q mod 2^64
    q_prefix_mod_2_64: tuple[int, ...]  # prod(q_0..q_{i-1}) mod 2^64

    @property
    def k(self) -> int:
        return len(self.primes)


@lru_cache(maxsize=None)
def torus_crt_plan(n: int, bound_bits: int) -> TorusCrtPlan:
    """Plan with the fewest 31-bit primes covering 2^(bound_bits+1) <= Q."""
    stream = two_adic_primes(_PRIME_BITS, _MAX_LOG_N + 1)
    primes: list[int] = []
    q_prod = 1
    while q_prod < (1 << (bound_bits + 1)):
        p = next(stream)
        primes.append(p)
        q_prod *= p
    primes_t = tuple(primes)
    k = len(primes_t)

    garner_inv = tuple(
        tuple(
            (
                mod_inverse(primes_t[j] % primes_t[i], primes_t[i]),
                int(shoup32(mod_inverse(primes_t[j] % primes_t[i], primes_t[i]), primes_t[i])[()]),
            )
            for j in range(i)
        )
        for i in range(k)
    )

    # mixed-radix digits of H = (Q-1)//2: H = h0 + h1*q0 + h2*q0*q1 + ...
    h = (q_prod - 1) // 2
    half_digits = []
    rem = h
    for qi in primes_t:
        half_digits.append(rem % qi)
        rem //= qi
    assert rem == 0

    prefix = []
    acc = 1
    for qi in primes_t:
        prefix.append(acc % (1 << 64))
        acc *= qi

    return TorusCrtPlan(
        n=n,
        primes=primes_t,
        plans=tuple(ntt32_plan(q, n) for q in primes_t),
        garner_inv=garner_inv,
        half_digits=tuple(half_digits),
        q_mod_2_64=q_prod % (1 << 64),
        q_prefix_mod_2_64=tuple(prefix),
    )


# ---------------------------------------------------------------------------
# Residue conversion + transforms
# ---------------------------------------------------------------------------


def torus_to_eval(x: jnp.ndarray, plan: TorusCrtPlan) -> tuple[jnp.ndarray, ...]:
    """NTT residues of a full-range torus polynomial (centered lift) under
    every plan prime. x: (..., n) u64 -> k arrays (..., n) u32."""
    return tuple(
        ntt32(i64_to_mod32(x, q), p) for q, p in zip(plan.primes, plan.plans)
    )


def small_to_eval(
    x: jnp.ndarray, plan: TorusCrtPlan, bound_bits: int = 31
) -> tuple[jnp.ndarray, ...]:
    """NTT residues of a SMALL centered polynomial (gadget digits,
    |coef| < 2^bound_bits <= 2^31): cheap sign-fold per prime. Accepts
    wrapping u64 or two's-complement u32 lanes."""
    if x.dtype == jnp.uint32:
        return tuple(
            ntt32(small_u32_to_mod32(x, q, bound_bits), p)
            for q, p in zip(plan.primes, plan.plans)
        )
    return tuple(
        ntt32(small_i64_to_mod32(x, q, bound_bits), p)
        for q, p in zip(plan.primes, plan.plans)
    )


@lru_cache(maxsize=None)
def monomial_eval_table(n: int, bound_bits: int) -> tuple[np.ndarray, np.ndarray]:
    """Host-precomputed evaluation-basis monomials for every X^s, s in [0, 2n).

    Returns (values, duals), each (k, 2n, n) u32: values[i, s, j] =
    psi_i^{(2*bitrev(j)+1)*s mod 2n} — the forward-NTT image of X^s under
    prime i — and the matching Shoup duals. A blind-rotation step gathers one
    row per ciphertext and rotates the accumulator POINTWISE in the NTT
    domain, replacing per-element coefficient gathers.
    """
    from ..utils.primes import two_adic_generator
    from .ntt import bit_reverse_indices

    plan = torus_crt_plan(n, bound_bits)
    rev = bit_reverse_indices(n)
    exps = (np.arange(2 * n)[:, None] * (2 * rev[None, :] + 1)) % (2 * n)  # (2n, n)
    vals, duals = [], []
    for q in plan.primes:
        psi = two_adic_generator(q, n.bit_length())  # order 2n
        psi_pows = np.empty(2 * n, dtype=np.uint64)
        acc = 1
        for t in range(2 * n):
            psi_pows[t] = acc
            acc = acc * psi % q
        v = psi_pows[exps].astype(np.uint32)
        vals.append(v)
        duals.append(shoup32(v, q))
    return np.stack(vals), np.stack(duals)


def key_to_eval_shoup(
    x: jnp.ndarray, plan: TorusCrtPlan
) -> tuple[tuple[jnp.ndarray, np.ndarray | jnp.ndarray], ...]:
    """Evaluation-basis residues of a CONSTANT torus polynomial together with
    their Shoup duals, for fast pointwise products against variable data."""
    out = []
    for q, p in zip(plan.primes, plan.plans):
        ev = ntt32(i64_to_mod32(x, q), p)
        ev_np = np.asarray(ev, dtype=np.uint64)
        dual = jnp.asarray(((ev_np.astype(object) << 32) // q).astype(np.uint32))
        out.append((ev, dual))
    return tuple(out)


def eval_mul_shoup(
    var: tuple[jnp.ndarray, ...],
    key: tuple[tuple[jnp.ndarray, jnp.ndarray], ...],
    plan: TorusCrtPlan,
) -> tuple[jnp.ndarray, ...]:
    """Pointwise products variable x constant-with-dual, per prime."""
    return tuple(
        mul_shoup32(v, kv, kd, q)
        for v, (kv, kd), q in zip(var, key, plan.primes)
    )


def eval_mul(
    a: tuple[jnp.ndarray, ...], b: tuple[jnp.ndarray, ...], plan: TorusCrtPlan
) -> tuple[jnp.ndarray, ...]:
    """Pointwise products variable x variable (Montgomery), per prime."""
    return tuple(mul_mod32(x, y, p.zq) for x, y, p in zip(a, b, plan.plans))


def garner_to_u64(
    residues: tuple[jnp.ndarray, ...], plan: TorusCrtPlan, *, intt_first: bool = True
) -> jnp.ndarray:
    """INTT each residue stream then Garner-combine to a wrapping u64 torus
    polynomial with centered lift (subtract Q when the value exceeds Q/2)."""
    coeffs = (
        tuple(intt32(r, p) for r, p in zip(residues, plan.plans))
        if intt_first
        else residues
    )
    k = plan.k
    # Mixed-radix digits v_i via Garner's sequential walk.
    v: list[jnp.ndarray] = []
    for i in range(k):
        qi = plan.primes[i]
        t = coeffs[i]
        for j in range(i):
            # v_j < q_j; reduce into [0, q_i) with at most one subtract since
            # both primes are 31-bit (q_j < 2*q_i always holds here).
            vj = v[j]
            qq = np.uint32(qi)
            vj = jnp.where(vj >= qq, vj - qq, vj)
            inv, inv_shoup = plan.garner_inv[i][j]
            t = mul_shoup32(sub_mod32(t, vj, qi), np.uint32(inv), np.uint32(inv_shoup), qi)
        v.append(t)

    # value = sum v_i * prod_{j<i} q_j (mod 2^64), accumulated on u32 limb
    # planes: each v_i < 2^32 times a 64-bit constant costs one mulhi32 + two
    # low muls instead of an emulated full u64 multiply.
    from .modular32 import mulhi32

    lo = v[0]
    hi = jnp.zeros_like(lo)
    for i in range(1, k):
        c = plan.q_prefix_mod_2_64[i]
        c_lo, c_hi = np.uint32(c & 0xFFFFFFFF), np.uint32(c >> 32)
        p_lo = v[i] * c_lo
        p_hi = mulhi32(v[i], c_lo) + v[i] * c_hi
        lo_new = lo + p_lo
        hi = hi + p_hi + (lo_new < lo).astype(jnp.uint32)
        lo = lo_new

    # centered lift: subtract Q iff (v_{k-1},...,v_0) > digits of (Q-1)//2
    over = jnp.zeros(v[0].shape, dtype=bool)
    for i in range(k):  # low to high: over = (v_i > h_i) | (v_i == h_i) & over
        h = np.uint32(plan.half_digits[i])
        over = (v[i] > h) | ((v[i] == h) & over)
    q_lo = np.uint32(plan.q_mod_2_64 & 0xFFFFFFFF)
    q_hi = np.uint32(plan.q_mod_2_64 >> 32)
    over32 = over.astype(jnp.uint32)
    lo_new = lo - over32 * q_lo
    hi = hi - over32 * q_hi - (lo_new > lo).astype(jnp.uint32)
    lo = lo_new
    return hi.astype(jnp.uint64) << np.uint64(32) | lo.astype(jnp.uint64)


def negacyclic_mul_t64_crt(
    a_small: jnp.ndarray, b: jnp.ndarray, log_b: int, rows: int = 1
) -> jnp.ndarray:
    """Exact a(X)*b(X) mod (X^N+1, 2^64): a_small centered with
    |coef| <= 2^(log_b-1), b arbitrary torus."""
    n = a_small.shape[-1]
    if n == 1:
        return jnp.asarray(a_small, jnp.uint64) * jnp.asarray(b, jnp.uint64)
    plan = torus_crt_plan(n, required_bound_bits(n, log_b, rows))
    ea = small_to_eval(a_small, plan, bound_bits=min(log_b, 31))
    eb = torus_to_eval(b, plan)
    return garner_to_u64(eval_mul(ea, eb, plan), plan)
