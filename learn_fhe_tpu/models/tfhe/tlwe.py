"""TLWE: LWE over the discretized torus Z/2^64 (reference `tlwe.rs`).

Everything is wrapping u64 -- additions, dots, and gadget digits need no
reduction at all, which makes the torus the cheapest possible scalar type on
TPU integer lanes.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
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
    """Wrapping decompose-dot (`tlwe.rs:144-153`).

    When the gadget digits fit int8 (log_b <= 7: digits live in
    (-B/2, B/2] and +B/2 must not exceed +127) the contraction rides the
    MXU: digits (i8) x balanced byte limbs of the key (8 x i8 matmuls with
    exact i32 accumulation, wrapping mod-2^64 recombination) — bit-identical
    to the u64 dot and ~7x faster at the PBS pipeline shapes."""
    limbs = decompose_t64(ct.a, params.gadget)  # (d, ..., n_from)
    limbs = jnp.moveaxis(limbs, 0, -2)
    flat = limbs.reshape(*limbs.shape[:-2], -1)  # (..., d*n_from)
    d, n_from, n_to = ksk.a.shape
    K = d * n_from
    if params.log_b <= 7 and K * (1 << (params.log_b - 1)) < (1 << 23):
        a = _mxu_wrapping_dot(flat, ksk.a.reshape(K, n_to))
        b = _mxu_wrapping_dot(flat, ksk.b.reshape(K, 1))[..., 0]
        return TlweCiphertext(a, b + ct.b)
    a = jnp.sum(flat[..., :, None] * ksk.a.reshape(K, n_to), axis=-2)
    b = jnp.sum(flat * ksk.b.reshape(K), axis=-1)
    return TlweCiphertext(a, b + ct.b)


def _mxu_wrapping_dot(digits_u64: jnp.ndarray, key_u64: jnp.ndarray) -> jnp.ndarray:
    """sum_k digits[..., k] * key[k, :] mod 2^64 with |digit| <= 127.

    digits: wrapping-u64 small signed values -> i8 (low byte is exact two's
    complement). key: u64 -> 8 balanced base-256 i8 limbs (centered signed
    representative; exact mod 2^64). Each limb matmul accumulates exactly in
    i32 (requires K * max|digit| * 128 < 2^31, gated by the caller)."""
    dig8 = digits_u64.astype(jnp.uint8).astype(jnp.int8)  # (..., K)
    t = key_u64.astype(jnp.int64)  # two's complement centered rep
    out = None
    for j in range(8):
        limb = ((t + 128) & 255) - 128  # balanced digit in [-128, 128)
        t = (t - limb) >> 8
        p = jax.lax.dot_general(
            dig8,
            limb.astype(jnp.int8),
            (((dig8.ndim - 1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )  # (..., n_to) exact
        term = p.astype(jnp.int64).astype(jnp.uint64) << np.uint64(8 * j)
        out = term if out is None else out + term
    return out
