"""TGGSW: ring gadget encryption over TGLWE (reference `tggsw.rs`) -- the
TFHE bootstrapping workhorse.

Layout: R = (k+1)*d rows of TGLWE ciphertexts:
a: (..., R, k, N), b: (..., R, N). Rows j*d..(j+1)*d (j < k) carry gadget
powers on a[.., j, :]; the last d rows on b (`tggsw.rs:73-89`).

For the CMux chain the key is pre-transformed once into the multi-prime u32
CRT NTT domain with Shoup duals (`TggswEval`, see `ops/torus_crt.py`); an
external product then costs R forward NTTs per prime for the decomposed
accumulator and (k+1) inverse NTTs per prime, the row contraction riding
pointwise Shoup multiplies in the evaluation domain, and one Garner
reconstruction back to wrapping u64 — all exact (no FFT rounding).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ...ops.gadget import (
    decompose_t64,
    decompose_t64_supports_u32,
    decompose_t64_u32,
    power_up_t64,
)
from ...ops.modular import u64
from ...ops.modular32 import i64_to_mod32, mul_shoup32, shoup32_device, sum_mod32
from ...ops.ntt32 import ntt32
from ...ops.torus_crt import (
    TorusCrtPlan,
    garner_to_u64,
    required_bound_bits,
    small_to_eval,
    torus_crt_plan,
)
from .params import TggswParams
from .tglwe import TglweCiphertext, sk_encrypt as tglwe_sk_encrypt
from .tlwe import TlweCiphertext  # noqa: F401  (re-export convenience)


def _crt_plan(params: TggswParams) -> TorusCrtPlan:
    rows = (params.k + 1) * params.d
    return torus_crt_plan(
        params.big_n, required_bound_bits(params.big_n, params.gadget.log_b, rows)
    )


class TggswCiphertext(NamedTuple):
    a: jnp.ndarray  # (..., R, k, N)
    b: jnp.ndarray  # (..., R, N)


class TggswEval(NamedTuple):
    """CRT-NTT residues of the rows with Shoup duals, one leaf per prime."""

    av: tuple[jnp.ndarray, ...]  # each (..., R, k, N) mod q_i
    ad: tuple[jnp.ndarray, ...]  # Shoup duals of av
    bv: tuple[jnp.ndarray, ...]  # each (..., R, N)
    bd: tuple[jnp.ndarray, ...]


@partial(jax.jit, static_argnums=(0, 1))
def _add_gadget_powers(k: int, d: int, a, b, powers):
    for j in range(k):
        a = a.at[..., j * d : (j + 1) * d, j, :].add(powers)
    b = b.at[..., k * d :, :].add(powers)
    return a, b


def sk_encrypt(
    params: TggswParams, sk: np.ndarray, pt, rng: np.random.Generator
) -> TggswCiphertext:
    """pt: (..., N) torus poly; R zero-encryptions + gadget powers
    (`tggsw.rs:73-89`)."""
    k, d, n = params.k, params.d, params.big_n
    powers = jax.jit(lambda x: jnp.moveaxis(power_up_t64(x, params.gadget), 0, -2))(
        u64(pt)
    )  # (..., d, N)
    shape = (*powers.shape[:-2], (k + 1) * d, n)
    zeros = tglwe_sk_encrypt(params.tglwe, sk, jnp.zeros(shape, dtype=jnp.uint64), rng)
    a, b = _add_gadget_powers(k, d, zeros.a, zeros.b, powers)
    return TggswCiphertext(a, b)


def decrypt(params: TggswParams, sk: np.ndarray, ct: TggswCiphertext) -> jnp.ndarray:
    from .tglwe import _dot_sk

    last = TglweCiphertext(ct.a[..., -1, :, :], ct.b[..., -1, :])
    mu_star = last.b - _dot_sk(last.a, sk)
    bits = params.gadget.log_bases[-1]
    return (mu_star + np.uint64((1 << bits) >> 1)) >> np.uint64(bits)


@partial(jax.jit, static_argnums=(0,))
def to_eval(params: TggswParams, ct: TggswCiphertext) -> TggswEval:
    """Key-side transform: per-prime NTT residues + device-computed Shoup
    duals so every external product multiplies by constants at 6 muls each."""
    plan = _crt_plan(params)
    av, ad, bv, bd = [], [], [], []
    for q, p in zip(plan.primes, plan.plans):
        ea = ntt32(i64_to_mod32(ct.a, q), p)
        eb = ntt32(i64_to_mod32(ct.b, q), p)
        av.append(ea)
        ad.append(shoup32_device(ea, q))
        bv.append(eb)
        bd.append(shoup32_device(eb, q))
    return TggswEval(tuple(av), tuple(ad), tuple(bv), tuple(bd))


def _decompose_rows(params: TggswParams, ct: TglweCiphertext) -> jnp.ndarray:
    """Stacked digits of (a_0..a_{k-1}, b), component-major: (..., R, N)."""
    ab = jnp.concatenate([ct.a, ct.b[..., None, :]], axis=-2)  # (..., k+1, N)
    if decompose_t64_supports_u32(params.gadget):
        hi = (u64(ab) >> np.uint64(32)).astype(jnp.uint32)
        limbs = decompose_t64_u32(hi, params.gadget)  # (d, ..., k+1, N) u32
    else:
        limbs = decompose_t64(ab, params.gadget)  # (d, ..., k+1, N) u64
    limbs = jnp.moveaxis(limbs, 0, -2)  # (..., k+1, d, N)
    return limbs.reshape(*limbs.shape[:-3], -1, params.big_n)  # (..., R, N)


def external_product(
    params: TggswParams, key: TggswEval, ct: TglweCiphertext
) -> TglweCiphertext:
    """RGSW-style row contraction in the CRT-NTT domain (`tggsw.rs:100-112`).

    Exactness: decomposed digits are bounded by 2^(log_b-1), so every
    row-contracted integer coefficient is < R * N * 2^(log_b-1) * 2^63
    < prod(primes)/2 by plan construction.
    """
    plan = _crt_plan(params)
    limbs = _decompose_rows(params, ct)  # (..., R, N) centered digits
    l_ev = small_to_eval(limbs, plan, bound_bits=min(params.gadget.log_b, 31))

    a_res, b_res = [], []
    for i, q in enumerate(plan.primes):
        le = l_ev[i]
        prod_a = mul_shoup32(le[..., :, None, :], key.av[i], key.ad[i], q)
        a_res.append(sum_mod32(prod_a, q, axis=-3))
        prod_b = mul_shoup32(le, key.bv[i], key.bd[i], q)
        b_res.append(sum_mod32(prod_b, q, axis=-2))
    a = garner_to_u64(tuple(a_res), plan)
    b = garner_to_u64(tuple(b_res), plan)
    return TglweCiphertext(a, b)


def cmux(
    params: TggswParams, key: TggswEval, ct0: TglweCiphertext, ct1: TglweCiphertext
) -> TglweCiphertext:
    """ct0 + key (*) (ct1 - ct0) (`tggsw.rs:114-121`)."""
    diff = TglweCiphertext(ct1.a - ct0.a, ct1.b - ct0.b)
    prod = external_product(params, key, diff)
    return TglweCiphertext(ct0.a + prod.a, ct0.b + prod.b)


def cmux_rotate(
    params: TggswParams,
    key: TggswEval,
    acc: TglweCiphertext,
    mon_v: tuple[jnp.ndarray, ...],
    mon_d: tuple[jnp.ndarray, ...],
) -> TglweCiphertext:
    """Blind-rotation step acc + (X^s - 1) (*) ExtProd(key, acc).

    Algebraically equal (up to one decomposition-rounding term, which sits at
    the same noise order as the reference's) to
    cmux(key, acc, acc * X^s) = acc + ExtProd(key, (X^s - 1) * acc): the
    monomial is moved OUT of the external product and applied pointwise in
    the NTT domain via gathered evaluation rows (`mon_v`/`mon_d`: per prime
    (..., N) values and Shoup duals from `ops.torus_crt.monomial_eval_table`).
    This removes the per-step coefficient-domain rotation (a batched u64
    gather that costs ~40% of a step) at the price of <=1 bit of extra noise.
    """
    plan = _crt_plan(params)
    limbs = _decompose_rows(params, acc)  # (..., R, N) centered digits
    l_ev = small_to_eval(limbs, plan, bound_bits=min(params.gadget.log_b, 31))

    from ...ops.modular32 import sub_mod32 as _sub32

    a_res, b_res = [], []
    for i, q in enumerate(plan.primes):
        le = l_ev[i]
        e_a = sum_mod32(
            mul_shoup32(le[..., :, None, :], key.av[i], key.ad[i], q), q, axis=-3
        )  # (..., k, N)
        e_b = sum_mod32(mul_shoup32(le, key.bv[i], key.bd[i], q), q, axis=-2)
        mv, md = mon_v[i], mon_d[i]  # (..., N)
        a_res.append(
            _sub32(mul_shoup32(e_a, mv[..., None, :], md[..., None, :], q), e_a, q)
        )
        b_res.append(_sub32(mul_shoup32(e_b, mv, md, q), e_b, q))
    da = garner_to_u64(tuple(a_res), plan)
    db = garner_to_u64(tuple(b_res), plan)
    return TglweCiphertext(acc.a + da, acc.b + db)
