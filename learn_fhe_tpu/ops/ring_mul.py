"""Exact negacyclic ring multiplication for NON-NTT moduli.

The reference dispatches ring muls on the modulus class: NTT for prime q,
recursive Karatsuba for everything else — power-of-two q and plain `i64`
polynomials (`util/src/ring.rs:256-264`, `util/src/ring/karatsuba.rs:44-76`).
Recursion with data-dependent splits is hostile to XLA; the TPU-native
equivalent implemented here recovers the exact integer product through the
multi-prime u32 CRT engine (`ops/torus_crt.py`): embed both operands mod k
NTT-friendly 31-bit primes, one negacyclic NTT each, pointwise multiply,
inverse-transform, and Garner-reconstruct the centered integer result —
recursion-free, static-shaped, and riding the same native-u32 butterflies as
every other hot path.

Exactness holds whenever n * 2^(bound_a + bound_b) < Q/2 with Q the prime
product — the plan picks just enough primes for the declared coefficient
bounds, exactly like the torus path does for gadget digits.
"""

from __future__ import annotations

import jax.numpy as jnp

from .modular32 import i64_to_mod32
from .ntt32 import ntt32
from .torus_crt import eval_mul, garner_to_u64, torus_crt_plan


def _embed_eval(x_u64: jnp.ndarray, plan):
    return tuple(
        ntt32(i64_to_mod32(x_u64, q), p) for q, p in zip(plan.primes, plan.plans)
    )


def _crt_mul_u64(a_u64: jnp.ndarray, b_u64: jnp.ndarray, bound_bits: int):
    """Wrapping-u64 view of the exact centered negacyclic product of two
    centered two's-complement operands."""
    n = a_u64.shape[-1]
    plan = torus_crt_plan(n, bound_bits)
    ea = _embed_eval(a_u64, plan)
    eb = _embed_eval(b_u64, plan)
    return garner_to_u64(eval_mul(ea, eb, plan), plan)


def negacyclic_mul_i64(
    a: jnp.ndarray, b: jnp.ndarray, bound_a_bits: int, bound_b_bits: int
) -> jnp.ndarray:
    """Exact a(X)*b(X) mod (X^n+1) over the INTEGERS, i64 in/out.

    |a_i| <= 2^bound_a_bits and |b_i| <= 2^bound_b_bits must hold; the result
    magnitude n*2^(bound_a+bound_b) must fit i64. Replaces the reference's
    `NegaCyclicRing<i64>` Karatsuba mul (`util/src/ring.rs:284-288`), e.g.
    the sk^2 ring square in CKKS keygen (`scheme/ckks/src/ckks.rs:78-80`)."""
    n = a.shape[-1]
    bound_bits = (n - 1).bit_length() + bound_a_bits + bound_b_bits + 1
    assert bound_bits <= 62, "result would overflow i64"
    out = _crt_mul_u64(
        a.astype(jnp.int64).astype(jnp.uint64),
        b.astype(jnp.int64).astype(jnp.uint64),
        bound_bits,
    )
    return out.astype(jnp.int64)


def negacyclic_mul_pow2(a: jnp.ndarray, b: jnp.ndarray, log_q: int) -> jnp.ndarray:
    """Exact a(X)*b(X) mod (X^n+1, 2^log_q), u64 in/out, 1 <= log_q <= 64.

    The power-of-two-modulus branch of the reference's mul dispatch
    (`util/src/ring.rs:256-264` -> Karatsuba). Operands are centered before
    embedding so the plan needs primes covering only n * 2^(2*log_q-2)."""
    assert 1 <= log_q <= 64
    n = a.shape[-1]

    def center(x):
        x = jnp.asarray(x, jnp.uint64)
        if log_q == 64:
            return x
        q = jnp.uint64(1 << log_q)
        half = jnp.uint64(1 << (log_q - 1))
        return jnp.where(x >= half, x - q, x)  # wraps to two's complement

    # centered |coef| <= 2^(log_q-1); +1 slack on each bound for the <= edge
    bound_bits = (n - 1).bit_length() + 2 * log_q
    out = _crt_mul_u64(center(a), center(b), bound_bits)
    if log_q == 64:
        return out
    return out & jnp.uint64((1 << log_q) - 1)
