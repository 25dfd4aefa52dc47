"""TGLWE: ring-LWE over the torus (reference `tglwe.rs`).

Ciphertext = (a: (..., k, N), b: (..., N)) u64. Ring products go through the
exact multi-prime u32 CRT NTT torus multiplier (`ops/torus_crt.py`) -- the
secret is binary, so the small-operand exactness bound always holds.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ...ops.modular import u64
from ...ops.poly import monomial_mul_t64
from ...ops.torus_crt import negacyclic_mul_t64_crt
from ...utils.distributions import binary, tdg, uniform_t64
from .params import TglweParams, TlweParams
from .tlwe import TlweCiphertext


class TglweCiphertext(NamedTuple):
    a: jnp.ndarray  # (..., k, N)
    b: jnp.ndarray  # (..., N)


def add(ct0: TglweCiphertext, ct1: TglweCiphertext) -> TglweCiphertext:
    return TglweCiphertext(ct0.a + ct1.a, ct0.b + ct1.b)


def sub(ct0: TglweCiphertext, ct1: TglweCiphertext) -> TglweCiphertext:
    return TglweCiphertext(ct0.a - ct1.a, ct0.b - ct1.b)


def sk_gen(params: TglweParams, rng: np.random.Generator) -> np.ndarray:
    """Binary key, chunked into k rings of degree N (`tglwe.rs:40-44,76-78`)."""
    return binary(rng, (params.k, params.big_n))


def encode(params: TglweParams, m) -> jnp.ndarray:
    return u64(m) << np.uint64(params.log_delta)


def decode(params: TglweParams, pt) -> jnp.ndarray:
    return (u64(pt) >> np.uint64(params.log_delta)) % u64(params.p)


@jax.jit
def _dot_sk_device(a: jnp.ndarray, sk_u: jnp.ndarray) -> jnp.ndarray:
    prods = negacyclic_mul_t64_crt(sk_u, u64(a), log_b=2)  # binary secret
    return jnp.sum(prods, axis=-2)


def _dot_sk(a: jnp.ndarray, sk: np.ndarray) -> jnp.ndarray:
    """sum_i a_i (*) s_i over the k ring components (jitted: eager dispatch
    on a tunneled TPU costs seconds per op)."""
    sk_u = jnp.asarray(np.asarray(sk).astype(np.uint64))  # (k, N)
    return _dot_sk_device(u64(a), sk_u)


@jax.jit
def _encrypt_b(a, sk_u, e, pt):
    return _dot_sk_device(a, sk_u) + e + pt


def sk_encrypt(
    params: TglweParams, sk: np.ndarray, pt, rng: np.random.Generator
) -> TglweCiphertext:
    pt = u64(pt)
    shape = pt.shape[:-1]
    a = jnp.asarray(uniform_t64(rng, (*shape, params.k, params.big_n)))
    e = jnp.asarray(tdg(params.std_dev, rng, (*shape, params.big_n)))
    sk_u = jnp.asarray(np.asarray(sk).astype(np.uint64))
    return TglweCiphertext(a, _encrypt_b(a, sk_u, e, pt))


def decrypt(params: TglweParams, sk: np.ndarray, ct: TglweCiphertext) -> jnp.ndarray:
    mu_star = ct.b - _dot_sk(ct.a, sk)
    half = np.uint64((1 << params.log_delta) >> 1)
    return ((mu_star + half) >> np.uint64(params.log_delta)) << np.uint64(
        params.log_delta
    )


def rotate(ct: TglweCiphertext, i) -> TglweCiphertext:
    """Multiply every component by X^i; i may be traced (`tglwe.rs:61-67`)."""
    return TglweCiphertext(monomial_mul_t64(ct.a, i), monomial_mul_t64(ct.b, i))


def sample_extract(params: TglweParams, ct: TglweCiphertext, i: int) -> TlweCiphertext:
    """Extract coefficient i as a flat big_n*k TLWE ciphertext
    (`tglwe.rs:115-127`)."""
    n = params.big_n
    head = u64(ct.a)[..., : i + 1][..., ::-1]
    tail = -u64(ct.a)[..., i + 1 :][..., ::-1]
    a = jnp.concatenate([head, tail], axis=-1)  # (..., k, N)
    a_flat = a.reshape(*a.shape[:-2], params.k * n)
    return TlweCiphertext(a_flat, ct.b[..., i])


def tlwe_view_params(params: TglweParams, log_b=None, d=None) -> TlweParams:
    return params.tlwe_view(log_b, d)
