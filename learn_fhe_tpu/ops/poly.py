"""Negacyclic polynomial structure ops: automorphism, monomial mul, extraction.

These are the data-movement (gather/roll/sign-flip) companions to the NTT
kernels; semantics follow the reference `util/src/avec.rs:34-50` (automorphism
with sign folding) and `util/src/ring.rs:299-313` (monomial multiplication).
All functions operate on the trailing coefficient axis and broadcast over
leading batch axes.
"""

from __future__ import annotations

from functools import lru_cache

import jax.numpy as jnp
import numpy as np

from .modular import neg_mod, u64


@lru_cache(maxsize=None)
def automorphism_map(n: int, t: int) -> tuple[np.ndarray, np.ndarray]:
    """Gather map for X -> X^t on R = Z[X]/(X^n+1).

    Returns (src, sign_neg) with out[k] = -in[src[k]] if sign_neg[k] else
    in[src[k]], matching the scatter form out[(i*t) mod 2n] = +-in[i]
    (`avec.rs:34-50`). t must be odd (a unit of Z_2n).
    """
    t = t % (2 * n)
    assert t % 2 == 1, "automorphism exponent must be odd"
    src = np.zeros(n, dtype=np.int64)
    sign_neg = np.zeros(n, dtype=bool)
    for i in range(n):
        it = (i * t) % (2 * n)
        if it < n:
            src[it] = i
            sign_neg[it] = False
        else:
            src[it - n] = i
            sign_neg[it - n] = True
    return src, sign_neg


def automorphism_zq(a: jnp.ndarray, t: int, q: int) -> jnp.ndarray:
    """Apply X -> X^t to a mod-q polynomial (trailing axis)."""
    n = a.shape[-1]
    src, sign_neg = automorphism_map(n, t)
    gathered = u64(a)[..., src]
    return jnp.where(jnp.asarray(sign_neg), neg_mod(gathered, q), gathered)


def automorphism_t64(a: jnp.ndarray, t: int) -> jnp.ndarray:
    """Apply X -> X^t to a torus polynomial (wrapping negation)."""
    n = a.shape[-1]
    src, sign_neg = automorphism_map(n, t)
    gathered = u64(a)[..., src]
    return jnp.where(jnp.asarray(sign_neg), -gathered, gathered)


def automorphism_i64(a: np.ndarray, t: int) -> np.ndarray:
    """Host-side automorphism of a signed coefficient vector (for keygen)."""
    n = a.shape[-1]
    src, sign_neg = automorphism_map(n, t)
    out = a[..., src].copy()
    out[..., sign_neg] = -out[..., sign_neg]
    return out


def monomial_mul_zq(a: jnp.ndarray, i, q: int) -> jnp.ndarray:
    """a(X) * X^i mod (X^n+1, q); i may be a traced integer (`ring.rs:299-313`).

    rotate_right by i mod n, negating the wrapped-around span.
    """
    n = a.shape[-1]
    i = jnp.asarray(i, dtype=jnp.int64) % (2 * n)
    r = i % n
    rolled = jnp.roll(u64(a), r, axis=-1)
    idx = jnp.arange(n, dtype=jnp.int64)
    neg_mask = jnp.where(i < n, idx < r, idx >= r)
    return jnp.where(neg_mask, neg_mod(rolled, q), rolled)


def monomial_mul_t64(a: jnp.ndarray, i) -> jnp.ndarray:
    """a(X) * X^i on the torus ring (wrapping negation)."""
    n = a.shape[-1]
    i = jnp.asarray(i, dtype=jnp.int64) % (2 * n)
    r = i % n
    rolled = jnp.roll(u64(a), r, axis=-1)
    idx = jnp.arange(n, dtype=jnp.int64)
    neg_mask = jnp.where(i < n, idx < r, idx >= r)
    return jnp.where(neg_mask, -rolled, rolled)


def sample_extract_a(a: jnp.ndarray, i: int, q: int) -> jnp.ndarray:
    """LWE mask extraction from an RLWE mask at coefficient i
    (`rlwe.rs:193-202`): [a_i, a_{i-1}, .., a_0, -a_{n-1}, .., -a_{i+1}]."""
    head = u64(a)[..., : i + 1][..., ::-1]
    tail = neg_mod(u64(a)[..., i + 1 :][..., ::-1], q)
    return jnp.concatenate([head, tail], axis=-1)
