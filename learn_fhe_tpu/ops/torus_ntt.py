"""Exact negacyclic torus (Z/2^64) polynomial multiplication via 2-prime NTT
+ Garner CRT.

The reference multiplies torus polynomials through a complex f64 FFT with
bit-exact rounding (`util/src/ring/fft/c64.rs`). On TPU, f64 is emulated and
slow, and the FFT path loses 64+log_b+log_n-53 bits of precision. This module
is the TPU-native alternative SURVEY.md §7.2 step 4 calls for: compute the
integer negacyclic product EXACTLY via CRT over two ~51-bit NTT primes, then
reduce mod 2^64 with a signed Garner reconstruction. Exactness holds whenever
the true product coefficients satisfy |c| < p1*p2/2 ~ 2^101; every TFHE use
site multiplies a small operand (gadget digits |.| <= 2^(log_b-1), binary
secrets, monomials) by a torus operand (|.| <= 2^63), bounding
|c| <= N * 2^(log_b-1) * 2^63 -- e.g. 2^96 for the reference PBS parameters
(N=2048, log_b=23), comfortably inside the window. This is strictly MORE
accurate than the reference's FFT64 (zero rounding error).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import lru_cache

import jax.numpy as jnp
import numpy as np

from ..utils.primes import mod_inverse, two_adic_primes
from .modular import ZqParams, mul_mod, u64
from .ntt import NttPlan, intt, ntt, ntt_plan

# Two ~51-bit NTT-friendly primes supporting N up to 2^13.
_PRIME_BITS = 51
_MAX_LOG_N = 13


@dataclass(frozen=True, eq=False)
class TorusMulPlan:
    n: int
    p1: int
    p2: int
    plan1: NttPlan
    plan2: NttPlan
    zq2: ZqParams
    p1_inv_p2: int  # p1^-1 mod p2
    q_mod: int  # (p1*p2) mod 2^64
    t_half: int  # floor((p1*p2/2) / p1)
    c_half: int  # (p1*p2)//2 - t_half*p1

    @property
    def small_bound(self) -> int:
        """Max |small operand| for exactness: p1*p2/2 / (N * 2^63)."""
        return (self.p1 * self.p2 // 2) // (self.n << 63)


@lru_cache(maxsize=None)
def torus_mul_plan(n: int) -> TorusMulPlan:
    primes = two_adic_primes(_PRIME_BITS, _MAX_LOG_N + 1)
    p1 = next(primes)
    p2 = next(primes)
    q = p1 * p2
    return TorusMulPlan(
        n=n,
        p1=p1,
        p2=p2,
        plan1=ntt_plan(p1, n),
        plan2=ntt_plan(p2, n),
        zq2=ZqParams(p2),
        p1_inv_p2=mod_inverse(p1 % p2, p2),
        q_mod=q % (1 << 64),
        t_half=(q // 2) // p1,
        c_half=(q // 2) - ((q // 2) // p1) * p1,
    )


def _wrap_to_mod_p(x: jnp.ndarray, p: int) -> jnp.ndarray:
    """Centered-lift a wrapping-u64 value and reduce mod p (exact)."""
    xi = u64(x).astype(jnp.int64)  # two's complement signed lift
    return (xi % jnp.int64(p)).astype(jnp.uint64)


class TorusEval:
    """Pre-transformed torus polynomial residues for repeated products."""

    __slots__ = ("e1", "e2")

    def __init__(self, e1: jnp.ndarray, e2: jnp.ndarray):
        self.e1 = e1
        self.e2 = e2


def to_eval_t64(x: jnp.ndarray, plan: TorusMulPlan) -> TorusEval:
    """NTT residues of a torus polynomial under both primes (trailing axis N)."""
    return TorusEval(
        ntt(_wrap_to_mod_p(x, plan.p1), plan.plan1),
        ntt(_wrap_to_mod_p(x, plan.p2), plan.plan2),
    )


def garner_to_u64(c1: jnp.ndarray, c2: jnp.ndarray, plan: TorusMulPlan) -> jnp.ndarray:
    """Signed CRT reconstruction mod 2^64 from residues (c1 mod p1, c2 mod p2).

    c = c1 + p1*t with t = (c2-c1)*p1^-1 mod p2, centered by subtracting
    p1*p2 when the representative >= p1*p2/2 (exact integer comparison via
    precomputed split thresholds), all in wrapping u64.
    """
    from .modular import barrett_reduce_u64, sub_mod

    diff = sub_mod(u64(c2), barrett_reduce_u64(c1, plan.p2), plan.p2)
    t = mul_mod(diff, u64(plan.p1_inv_p2), plan.zq2)
    rep = u64(c1) + u64(plan.p1) * t  # wrapping; true value fits 102 bits
    over = (t > u64(plan.t_half)) | (
        (t == u64(plan.t_half)) & (u64(c1) >= u64(plan.c_half))
    )
    return jnp.where(over, rep - u64(plan.q_mod), rep)


def from_eval_t64(ev: TorusEval, plan: TorusMulPlan) -> jnp.ndarray:
    """Inverse NTT both residues and Garner-combine to wrapping u64."""
    c1 = intt(ev.e1, plan.plan1)
    c2 = intt(ev.e2, plan.plan2)
    return garner_to_u64(c1, c2, plan)


def negacyclic_mul_t64(a_small: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Exact a(X)*b(X) mod (X^N+1, 2^64), a_small with small centered
    magnitude (gadget digits / binary secrets), b arbitrary torus."""
    n = a_small.shape[-1]
    if n == 1:
        return u64(a_small) * u64(b)
    plan = torus_mul_plan(n)
    ea = to_eval_t64(a_small, plan)
    eb = to_eval_t64(b, plan)
    from .modular import mul_mod as _mm

    c1 = intt(_mm(ea.e1, eb.e1, plan.plan1.zq), plan.plan1)
    c2 = intt(_mm(ea.e2, eb.e2, plan.plan2.zq), plan.plan2)
    return garner_to_u64(c1, c2, plan)
