"""TGGSW: ring gadget encryption over TGLWE (reference `tggsw.rs`) -- the
TFHE bootstrapping workhorse.

Layout: R = (k+1)*d rows of TGLWE ciphertexts:
a: (..., R, k, N), b: (..., R, N). Rows j*d..(j+1)*d (j < k) carry gadget
powers on a[.., j, :]; the last d rows on b (`tggsw.rs:73-89`).

For the CMux chain the key is pre-transformed once into the 2-prime NTT
domain (`TggswEval`); an external product then costs R forward NTTs per prime
for the decomposed accumulator and (k+1) inverse NTTs per prime, with the
row contraction done pointwise in the evaluation domain.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from ...ops.gadget import decompose_t64, power_up_t64
from ...ops.modular import mul_mod, u64
from ...ops.ntt import intt, ntt
from ...ops.torus_ntt import TorusMulPlan, garner_to_u64, torus_mul_plan, _wrap_to_mod_p
from .params import TggswParams
from .tglwe import TglweCiphertext, sk_encrypt as tglwe_sk_encrypt
from .tlwe import TlweCiphertext  # noqa: F401  (re-export convenience)


class TggswCiphertext(NamedTuple):
    a: jnp.ndarray  # (..., R, k, N)
    b: jnp.ndarray  # (..., R, N)


class TggswEval(NamedTuple):
    """NTT residues of the rows under both torus primes."""

    a1: jnp.ndarray  # (..., R, k, N) mod p1
    a2: jnp.ndarray
    b1: jnp.ndarray  # (..., R, N)
    b2: jnp.ndarray


def sk_encrypt(
    params: TggswParams, sk: np.ndarray, pt, rng: np.random.Generator
) -> TggswCiphertext:
    """pt: (..., N) torus poly; R zero-encryptions + gadget powers
    (`tggsw.rs:73-89`)."""
    k, d, n = params.k, params.d, params.big_n
    powers = power_up_t64(u64(pt), params.gadget)  # (d, ..., N)
    powers = jnp.moveaxis(powers, 0, -2)  # (..., d, N)
    shape = (*powers.shape[:-2], (k + 1) * d, n)
    zeros = tglwe_sk_encrypt(params.tglwe, sk, jnp.zeros(shape, dtype=jnp.uint64), rng)
    a, b = zeros.a, zeros.b  # (..., R, k, N), (..., R, N)
    for j in range(k):
        a = a.at[..., j * d : (j + 1) * d, j, :].add(powers)
    b = b.at[..., k * d :, :].add(powers)
    return TggswCiphertext(a, b)


def decrypt(params: TggswParams, sk: np.ndarray, ct: TggswCiphertext) -> jnp.ndarray:
    from .tglwe import _dot_sk

    last = TglweCiphertext(ct.a[..., -1, :, :], ct.b[..., -1, :])
    mu_star = last.b - _dot_sk(last.a, sk)
    bits = params.gadget.log_bases[-1]
    return (mu_star + np.uint64((1 << bits) >> 1)) >> np.uint64(bits)


def to_eval(params: TggswParams, ct: TggswCiphertext) -> TggswEval:
    plan = torus_mul_plan(params.big_n)
    return TggswEval(
        ntt(_wrap_to_mod_p(ct.a, plan.p1), plan.plan1),
        ntt(_wrap_to_mod_p(ct.a, plan.p2), plan.plan2),
        ntt(_wrap_to_mod_p(ct.b, plan.p1), plan.plan1),
        ntt(_wrap_to_mod_p(ct.b, plan.p2), plan.plan2),
    )


def _decompose_rows(params: TggswParams, ct: TglweCiphertext) -> jnp.ndarray:
    """Stacked digits of (a_0..a_{k-1}, b), component-major: (..., R, N)."""
    ab = jnp.concatenate([ct.a, ct.b[..., None, :]], axis=-2)  # (..., k+1, N)
    limbs = decompose_t64(ab, params.gadget)  # (d, ..., k+1, N)
    limbs = jnp.moveaxis(limbs, 0, -2)  # (..., k+1, d, N)
    return limbs.reshape(*limbs.shape[:-3], -1, params.big_n)  # (..., R, N)


def external_product(
    params: TggswParams, key: TggswEval, ct: TglweCiphertext
) -> TglweCiphertext:
    """RGSW-style row contraction in the 2-prime NTT domain (`tggsw.rs:100-112`).

    Exactness: decomposed digits are bounded by 2^(log_b-1), so each
    integer product coefficient is < N * 2^(log_b-1) * 2^63 * R < p1*p2/2.
    """
    plan = torus_mul_plan(params.big_n)
    limbs = _decompose_rows(params, ct)  # (..., R, N)
    l1 = ntt(_wrap_to_mod_p(limbs, plan.p1), plan.plan1)
    l2 = ntt(_wrap_to_mod_p(limbs, plan.p2), plan.plan2)

    from ...ops.modular import sum_mod

    def sum_rows(le, ke, p, zq, extra_axis):
        """Modular row contraction in the evaluation domain."""
        lb = le[..., :, None, :] if extra_axis else le
        prod = mul_mod(lb, ke, zq)
        return sum_mod(prod, p, axis=-3 if extra_axis else -2)

    a1 = sum_rows(l1, key.a1, plan.p1, plan.plan1.zq, True)
    a2 = sum_rows(l2, key.a2, plan.p2, plan.plan2.zq, True)
    b1 = sum_rows(l1, key.b1, plan.p1, plan.plan1.zq, False)
    b2 = sum_rows(l2, key.b2, plan.p2, plan.plan2.zq, False)
    a = garner_to_u64(intt(a1, plan.plan1), intt(a2, plan.plan2), plan)
    b = garner_to_u64(intt(b1, plan.plan1), intt(b2, plan.plan2), plan)
    return TglweCiphertext(a, b)


def cmux(
    params: TggswParams, key: TggswEval, ct0: TglweCiphertext, ct1: TglweCiphertext
) -> TglweCiphertext:
    """ct0 + key (*) (ct1 - ct0) (`tggsw.rs:114-121`)."""
    diff = TglweCiphertext(ct1.a - ct0.a, ct1.b - ct0.b)
    prod = external_product(params, key, diff)
    return TglweCiphertext(ct0.a + prod.a, ct0.b + prod.b)
