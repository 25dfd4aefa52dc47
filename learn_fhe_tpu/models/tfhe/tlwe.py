"""TLWE: LWE over the discretized torus Z/2^64 (reference `tlwe.rs`).

Everything is wrapping u64 -- additions, dots, and gadget digits need no
reduction at all, which makes the torus the cheapest possible scalar type on
TPU integer lanes.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from ...ops.gadget import decompose_t64, power_up_t64
from ...ops.modular import u64
from ...utils.distributions import binary, tdg, uniform_t64
from .params import TlweParams


class TlweCiphertext(NamedTuple):
    a: jnp.ndarray  # (..., n) u64
    b: jnp.ndarray  # (...,) u64


class TlweKeySwitchingKey(NamedTuple):
    a: jnp.ndarray  # (d, n_from, n_to)
    b: jnp.ndarray  # (d, n_from)


def add(ct0: TlweCiphertext, ct1: TlweCiphertext) -> TlweCiphertext:
    return TlweCiphertext(ct0.a + ct1.a, ct0.b + ct1.b)


def sub(ct0: TlweCiphertext, ct1: TlweCiphertext) -> TlweCiphertext:
    return TlweCiphertext(ct0.a - ct1.a, ct0.b - ct1.b)


def sk_gen(params: TlweParams, rng: np.random.Generator) -> np.ndarray:
    """Binary secret (`tlwe.rs:96-98`)."""
    return binary(rng, params.n)


def encode(params: TlweParams, m) -> jnp.ndarray:
    """Shift into the top bits (`tlwe.rs:113-116`)."""
    return u64(m) << np.uint64(params.log_delta)


def decode(params: TlweParams, pt) -> jnp.ndarray:
    return (u64(pt) >> np.uint64(params.log_delta)) % u64(params.p)


def _round(pt: jnp.ndarray, bits: int) -> jnp.ndarray:
    """rounding_shr then shift back (`decompose.rs:120-122`)."""
    half = np.uint64((1 << bits) >> 1)
    return ((u64(pt) + half) >> np.uint64(bits)) << np.uint64(bits)


def _dot_sk(a: jnp.ndarray, sk: np.ndarray) -> jnp.ndarray:
    return jnp.sum(u64(a) * jnp.asarray(sk.astype(np.uint64)), axis=-1)


def sk_encrypt(
    params: TlweParams, sk: np.ndarray, pt, rng: np.random.Generator
) -> TlweCiphertext:
    pt = u64(pt)
    a = jnp.asarray(uniform_t64(rng, (*pt.shape, params.n)))
    e = jnp.asarray(tdg(params.std_dev, rng, pt.shape))
    return TlweCiphertext(a, _dot_sk(a, sk) + e + pt)


def decrypt(params: TlweParams, sk: np.ndarray, ct: TlweCiphertext) -> jnp.ndarray:
    """Rounded phase (`tlwe.rs:134-142`)."""
    mu_star = ct.b - _dot_sk(ct.a, sk)
    return _round(mu_star, params.log_delta)


def ksk_gen(
    params: TlweParams, sk0: np.ndarray, sk1: np.ndarray, rng: np.random.Generator
) -> TlweKeySwitchingKey:
    """Encrypt power_up(-sk1) under sk0 (`tlwe.rs:100-111`)."""
    neg_sk1 = jnp.asarray((-np.asarray(sk1)).astype(np.uint64))
    pt = power_up_t64(neg_sk1, params.gadget)  # (d, n_from)
    ct = sk_encrypt(params, sk0, pt, rng)
    return TlweKeySwitchingKey(ct.a, ct.b)


def key_switch(
    params: TlweParams, ksk: TlweKeySwitchingKey, ct: TlweCiphertext
) -> TlweCiphertext:
    """Wrapping decompose-dot (`tlwe.rs:144-153`)."""
    limbs = decompose_t64(ct.a, params.gadget)  # (d, ..., n_from)
    limbs = jnp.moveaxis(limbs, 0, -2)
    flat = limbs.reshape(*limbs.shape[:-2], -1)  # (..., d*n_from)
    d, n_from, n_to = ksk.a.shape
    a = jnp.sum(flat[..., :, None] * ksk.a.reshape(d * n_from, n_to), axis=-2)
    b = jnp.sum(flat * ksk.b.reshape(d * n_from), axis=-1)
    return TlweCiphertext(a, b + ct.b)
