"""Batched negacyclic NTT over Z_q[X]/(X^N+1) for primes q < 2^31 — u32 lanes.

Same merged-twist DIT/DIF algorithm as `ops/ntt.py` (Algorithms 1-2 of eprint
2016/504; reference `util/src/ring/fft.rs:40-77`, `fft/zq.rs`), but on native
32-bit vector lanes: a Shoup butterfly is one mulhi32 + two low muls, ~20x
faster than the emulated u64 path on TPU. This is the transform underneath
the FHEW scheme (q ~ 2^28) and the 4-prime CRT torus multiplier
(`ops/torus_crt.py`) that drives TFHE's blind rotation.

Forward: normal order -> bit-reversed; inverse: bit-reversed -> normal.
Twiddle tables match the reference's (`fft/zq.rs:58-67`): psi_br[k] =
psi_{2N}^{bitrev(k)} from the canonical two-adic generator, so values in
evaluation basis agree element-for-element with the u64 path and the Rust
reference for any q that fits both.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import lru_cache

import jax.numpy as jnp
import numpy as np

from ..utils.primes import mod_inverse, two_adic_generator
from .modular32 import (
    Zq32Params,
    add_mod32,
    mul_mod32,
    mul_shoup32,
    shoup32,
    sub_mod32,
    u32,
)
from .ntt import bit_reverse_indices


@dataclass(frozen=True, eq=False)
class Ntt32Plan:
    """Pure precomputed twiddle stacks for one (q, n), q < 2^31."""

    q: int
    n: int
    log_n: int
    zq: Zq32Params
    psi_br: np.ndarray  # (n,) u32: psi_{2n}^{bitrev(k)}
    psi_br_shoup: np.ndarray
    psi_inv_br: np.ndarray
    psi_inv_br_shoup: np.ndarray
    n_inv: int
    n_inv_shoup: int


@lru_cache(maxsize=None)
def ntt32_plan(q: int, n: int) -> Ntt32Plan:
    assert n & (n - 1) == 0
    assert q < (1 << 31), "u32 NTT needs q < 2^31; use ops.ntt for larger q"
    log_n = n.bit_length() - 1
    assert (q - 1) % (2 * n) == 0, f"q={q} is not NTT-friendly for n={n}"
    psi = two_adic_generator(q, log_n + 1)
    rev = bit_reverse_indices(n)
    pow_list = []
    acc = 1
    for _ in range(n):
        pow_list.append(acc)
        acc = acc * psi % q
    inv_list = [mod_inverse(p, q) for p in pow_list]
    psi_br = np.array(pow_list, dtype=np.uint32)[rev]
    psi_inv_br = np.array(inv_list, dtype=np.uint32)[rev]
    n_inv = mod_inverse(n % q, q)
    return Ntt32Plan(
        q=q,
        n=n,
        log_n=log_n,
        zq=Zq32Params(q),
        psi_br=psi_br,
        psi_br_shoup=shoup32(psi_br, q),
        psi_inv_br=psi_inv_br,
        psi_inv_br_shoup=shoup32(psi_inv_br, q),
        n_inv=n_inv,
        n_inv_shoup=int(shoup32(n_inv, q)[()]),
    )


def ntt32(a: jnp.ndarray, plan: Ntt32Plan) -> jnp.ndarray:
    """Forward negacyclic NTT over the last axis (normal -> bit-reversed)."""
    n, q = plan.n, plan.q
    if n == 1:
        return u32(a)
    batch = a.shape[:-1]
    out = u32(a)
    for layer in range(plan.log_n):
        m = 1 << layer
        half = n >> (layer + 1)
        x = out.reshape(*batch, m, 2, half)
        u, v = x[..., 0, :], x[..., 1, :]
        t = plan.psi_br[m : 2 * m][:, None]  # np constant -> HLO constant
        ts = plan.psi_br_shoup[m : 2 * m][:, None]
        tv = mul_shoup32(v, t, ts, q)
        out = jnp.stack([add_mod32(u, tv, q), sub_mod32(u, tv, q)], axis=-2).reshape(
            *batch, n
        )
    return out


def intt32(a: jnp.ndarray, plan: Ntt32Plan) -> jnp.ndarray:
    """Inverse negacyclic NTT over the last axis (bit-reversed -> normal)."""
    n, q = plan.n, plan.q
    if n == 1:
        return u32(a)
    batch = a.shape[:-1]
    out = u32(a)
    for layer in reversed(range(plan.log_n)):
        m = 1 << layer
        half = n >> (layer + 1)
        x = out.reshape(*batch, m, 2, half)
        u, v = x[..., 0, :], x[..., 1, :]
        t = plan.psi_inv_br[m : 2 * m][:, None]
        ts = plan.psi_inv_br_shoup[m : 2 * m][:, None]
        s = add_mod32(u, v, q)
        d = mul_shoup32(sub_mod32(u, v, q), t, ts, q)
        out = jnp.stack([s, d], axis=-2).reshape(*batch, n)
    return mul_shoup32(
        out, np.uint32(plan.n_inv), np.uint32(plan.n_inv_shoup), q
    )


def pointwise_mul32(a: jnp.ndarray, b: jnp.ndarray, plan: Ntt32Plan) -> jnp.ndarray:
    """Evaluation-basis pointwise product (general Montgomery path)."""
    return mul_mod32(a, b, plan.zq)


def negacyclic_mul32(a: jnp.ndarray, b: jnp.ndarray, plan: Ntt32Plan) -> jnp.ndarray:
    """Full coefficient-basis negacyclic product: NTT -> pointwise -> INTT."""
    return intt32(pointwise_mul32(ntt32(a, plan), ntt32(b, plan), plan), plan)
