"""LWE over Z_q, batched-array layout (reference `scheme/fhew/src/lwe.rs`).

Ciphertext = (a: (..., n) u64, b: (...,) u64); any leading batch shape.
Secret keys are host numpy i64 vectors (sampling is host work); all ciphertext
algebra is jnp and jit-friendly. The threshold (share) API mirrors
`lwe.rs:163-238`: shares are pure functions over a common reference string,
merging is addition.
"""

from __future__ import annotations

from functools import partial
from typing import Iterable, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ...ops.gadget import decompose_zq, power_up_zq
from ...ops.modular import (
    add_mod,
    from_i64,
    mod_switch,
    mod_switch_odd,
    modular_dot,
    neg_mod,
    sub_mod,
    to_center_i64,
    u64,
    _round_half_away,
)
from ...utils.distributions import dg, uniform_zq
from .params import LweParams


class LweCiphertext(NamedTuple):
    a: jnp.ndarray  # (..., n)
    b: jnp.ndarray  # (...,)

    def __add__(self, other):
        # q is carried by the caller; plain wrapping add is wrong -> use helpers
        raise TypeError("use lwe.add(params, ct0, ct1)")


class LweKeySwitchingKey(NamedTuple):
    a: jnp.ndarray  # (d, n_from, n_to)
    b: jnp.ndarray  # (d, n_from)


def add(params: LweParams, ct0: LweCiphertext, ct1: LweCiphertext) -> LweCiphertext:
    return LweCiphertext(add_mod(ct0.a, ct1.a, params.q), add_mod(ct0.b, ct1.b, params.q))


def sub(params: LweParams, ct0: LweCiphertext, ct1: LweCiphertext) -> LweCiphertext:
    return LweCiphertext(sub_mod(ct0.a, ct1.a, params.q), sub_mod(ct0.b, ct1.b, params.q))


def double(params: LweParams, ct: LweCiphertext) -> LweCiphertext:
    return add(params, ct, ct)


def neg(params: LweParams, ct: LweCiphertext) -> LweCiphertext:
    return LweCiphertext(neg_mod(ct.a, params.q), neg_mod(ct.b, params.q))


def ct_mod_switch(ct: LweCiphertext, q: int, q_prime: int) -> LweCiphertext:
    return LweCiphertext(mod_switch(ct.a, q, q_prime), mod_switch(ct.b, q, q_prime))


def ct_mod_switch_odd(ct: LweCiphertext, q: int, q_prime: int) -> LweCiphertext:
    return LweCiphertext(mod_switch_odd(ct.a, q, q_prime), mod_switch_odd(ct.b, q, q_prime))


# -- keygen / encrypt / decrypt ---------------------------------------------


def sk_gen(params: LweParams, rng: np.random.Generator) -> np.ndarray:
    """Secret key ~ dg(3.2, 6)^n, host i64 (`lwe.rs:103-106`)."""
    return dg(3.2, 6, rng, params.n)


def encode(params: LweParams, m) -> jnp.ndarray:
    """round(centered(m) * q/p) mod q in f64, matching `lwe.rs:121-124`."""
    m = jnp.asarray(m, dtype=jnp.uint64)
    mc = to_center_i64(m, params.p).astype(jnp.float64)
    pt = _round_half_away(mc * jnp.float64(params.delta)).astype(jnp.int64)
    return (pt % jnp.int64(params.q)).astype(jnp.uint64)


def decode(params: LweParams, pt) -> jnp.ndarray:
    """round(centered(pt) / delta) mod p (`lwe.rs:126-128`)."""
    ptc = to_center_i64(u64(pt), params.q).astype(jnp.float64)
    m = _round_half_away(ptc / jnp.float64(params.delta)).astype(jnp.int64)
    return (m % jnp.int64(params.p)).astype(jnp.uint64)


@partial(jax.jit, static_argnums=(0,))
def _encrypt_core(params: LweParams, a, sk_q, pt, e):
    return add_mod(add_mod(modular_dot(a, sk_q, params.q), pt, params.q), e, params.q)


@partial(jax.jit, static_argnums=(0,))
def _decrypt_core(params: LweParams, a, b, sk_q):
    return sub_mod(b, modular_dot(a, sk_q, params.q), params.q)


def sk_encrypt(
    params: LweParams, sk: np.ndarray, pt, rng: np.random.Generator
) -> LweCiphertext:
    """b = <a, sk> + pt + e with fresh uniform a (`lwe.rs:130-140`).

    pt may carry any batch shape (...,); returns a batched ciphertext.
    """
    pt = u64(pt)
    shape = pt.shape
    a = jnp.asarray(uniform_zq(params.q, rng, (*shape, params.n)))
    e = from_i64(jnp.asarray(dg(3.2, 6, rng, shape)), params.q)
    b = _encrypt_core(params, a, _sk_q(params, sk), pt, e)
    return LweCiphertext(a, b)


def decrypt(params: LweParams, sk: np.ndarray, ct: LweCiphertext) -> jnp.ndarray:
    """pt = b - <a, sk> (`lwe.rs:142-149`)."""
    return _decrypt_core(params, u64(ct.a), u64(ct.b), _sk_q(params, sk))


def _sk_q(params: LweParams, sk: np.ndarray) -> jnp.ndarray:
    return jnp.asarray(np.asarray(sk, dtype=np.int64) % params.q).astype(jnp.uint64)


@partial(jax.jit, static_argnums=(0,))
def _dot_core(q: int, a, sk_q):
    return modular_dot(a, sk_q, q)


def _dot_sk(params: LweParams, a: jnp.ndarray, sk: np.ndarray) -> jnp.ndarray:
    return _dot_core(params.q, u64(a), _sk_q(params, sk))


# -- key switching -----------------------------------------------------------


def ksk_gen(
    params: LweParams, sk0: np.ndarray, sk1: np.ndarray, rng: np.random.Generator
) -> LweKeySwitchingKey:
    """Encrypt power_up(-sk1) under sk0 (`lwe.rs:108-119`).

    sk1 has dim n_from, sk0 dim params.n; output rows (d, n_from).
    """
    neg_sk1 = from_i64(jnp.asarray(-np.asarray(sk1)), params.q)
    pt = power_up_zq(neg_sk1, params.gadget)  # (d, n_from)
    ct = sk_encrypt(params, sk0, pt, rng)
    return LweKeySwitchingKey(ct.a, ct.b)


@partial(jax.jit, static_argnums=(0,))
def key_switch(
    params: LweParams, ksk: LweKeySwitchingKey, ct: LweCiphertext
) -> LweCiphertext:
    """Decompose ct.a and dot against the ksk rows (`lwe.rs:151-160`).

    ct has dim n_from = ksk.a.shape[1]; output dim params.n.
    """
    limbs = decompose_zq(ct.a, params.gadget)  # (d, ..., n_from)
    limbs = jnp.moveaxis(limbs, 0, -2)  # (..., d, n_from)
    batch = limbs.shape[:-2]
    flat = limbs.reshape(*batch, -1)  # (..., d*n_from)
    d, n_from, n_to = ksk.a.shape
    a = modular_dot(flat, ksk.a.reshape(d * n_from, n_to), params.q)
    b = modular_dot(flat, ksk.b.reshape(d * n_from), params.q)
    return LweCiphertext(a, add_mod(b, ct.b, params.q))


# -- threshold / multi-party API (`lwe.rs:163-238`) --------------------------


def sk_share_encrypt(
    params: LweParams, a: jnp.ndarray, sk: np.ndarray, pt, rng: np.random.Generator
) -> jnp.ndarray:
    """b-share under a common mask a."""
    pt = u64(pt)
    e = from_i64(jnp.asarray(dg(3.2, 6, rng, pt.shape)), params.q)
    return add_mod(add_mod(_dot_sk(params, a, sk), pt, params.q), e, params.q)


def encryption_share_merge(
    params: LweParams, a: jnp.ndarray, shares: Iterable[jnp.ndarray]
) -> LweCiphertext:
    b = None
    for s in shares:
        b = s if b is None else add_mod(b, s, params.q)
    return LweCiphertext(a, b)


def share_decrypt(
    params: LweParams, sk: np.ndarray, a: jnp.ndarray, rng: np.random.Generator
) -> jnp.ndarray:
    """Noisy partial decryption <a, sk_i> + e (`lwe.rs:194-203`)."""
    e = from_i64(jnp.asarray(dg(3.2, 6, rng, a.shape[:-1])), params.q)
    return add_mod(_dot_sk(params, a, sk), e, params.q)


def decryption_share_merge(
    params: LweParams, b, shares: Iterable[jnp.ndarray]
) -> jnp.ndarray:
    acc = None
    for s in shares:
        acc = s if acc is None else add_mod(acc, s, params.q)
    return sub_mod(u64(b), acc, params.q)


def ksk_share_gen(
    params: LweParams,
    crs_a: jnp.ndarray,
    sk0: np.ndarray,
    sk1: np.ndarray,
    rng: np.random.Generator,
) -> jnp.ndarray:
    """Share of a key-switching key under a common a (`lwe.rs:214-226`).

    crs_a: (d, n_from, n), returns b-shares (d, n_from).
    """
    neg_sk1 = from_i64(jnp.asarray(-np.asarray(sk1)), params.q)
    pt = power_up_zq(neg_sk1, params.gadget)
    return sk_share_encrypt(params, crs_a, sk0, pt, rng)


def ksk_share_merge(
    params: LweParams, crs_a: jnp.ndarray, shares: Iterable[jnp.ndarray]
) -> LweKeySwitchingKey:
    ct = encryption_share_merge(params, crs_a, shares)
    return LweKeySwitchingKey(ct.a, ct.b)
