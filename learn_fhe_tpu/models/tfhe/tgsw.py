"""TGSW: gadget encryption of a torus scalar over TLWE vectors
(reference `tgsw.rs`). Used standalone for scalar cmux; the ring variant in
tggsw.py is the bootstrapping workhorse.

Layout: R = (n+1)*d rows of TLWE ciphertexts, stacked:
a: (R, n), b: (R,). Rows j*d..(j+1)*d (j < n) carry gadget powers added to
a[:, j]; the last d rows carry them on b (`tgsw.rs:70-86`).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from ...ops.gadget import decompose_t64, power_up_t64
from ...ops.modular import u64
from .params import TgswParams
from .tlwe import TlweCiphertext, sk_encrypt as tlwe_sk_encrypt, decrypt as tlwe_decrypt


class TgswCiphertext(NamedTuple):
    a: jnp.ndarray  # (..., R, n)
    b: jnp.ndarray  # (..., R)


def sk_encrypt(
    params: TgswParams, sk: np.ndarray, pt, rng: np.random.Generator
) -> TgswCiphertext:
    n, d = params.tlwe.n, params.d
    powers = power_up_t64(u64(pt), params.gadget)  # (d, ...)
    powers = jnp.moveaxis(powers, 0, -1)  # (..., d)
    shape = (*powers.shape[:-1], (n + 1) * d)
    zeros = tlwe_sk_encrypt(params.tlwe, sk, jnp.zeros(shape, dtype=jnp.uint64), rng)
    a, b = zeros.a, zeros.b
    for j in range(n):
        a = a.at[..., j * d : (j + 1) * d, j].add(powers)
    b = b.at[..., n * d :].add(powers)
    return TgswCiphertext(a, b)


def decrypt(params: TgswParams, sk: np.ndarray, ct: TgswCiphertext) -> jnp.ndarray:
    """Decrypt the last row, rounding-shr by the top base (`tgsw.rs:88-95`)."""
    last = TlweCiphertext(ct.a[..., -1, :], ct.b[..., -1])
    mu_star = last.b - jnp.sum(u64(last.a) * jnp.asarray(sk.astype(np.uint64)), axis=-1)
    bits = params.gadget.log_bases[-1]
    return (mu_star + np.uint64((1 << bits) >> 1)) >> np.uint64(bits)


def external_product(
    params: TgswParams, ct0: TgswCiphertext, ct1: TlweCiphertext
) -> TlweCiphertext:
    """decompose(a || b) dotted against the rows (`tgsw.rs:97-108`)."""
    ab = jnp.concatenate([ct1.a, ct1.b[..., None]], axis=-1)  # (..., n+1)
    limbs = decompose_t64(ab, params.gadget)  # (d, ..., n+1)
    limbs = jnp.moveaxis(limbs, 0, -1)  # (..., n+1, d)
    flat = limbs.reshape(*limbs.shape[:-2], -1)  # (..., R) component-major
    a = jnp.sum(flat[..., :, None] * ct0.a, axis=-2)
    b = jnp.sum(flat * ct0.b, axis=-1)
    return TlweCiphertext(a, b)


def cmux(
    params: TgswParams, b: TgswCiphertext, ct0: TlweCiphertext, ct1: TlweCiphertext
) -> TlweCiphertext:
    """ct0 + b (*) (ct1 - ct0) (`tgsw.rs:110-117`)."""
    diff = TlweCiphertext(ct1.a - ct0.a, ct1.b - ct0.b)
    prod = external_product(params, b, diff)
    return TlweCiphertext(ct0.a + prod.a, ct0.b + prod.b)
