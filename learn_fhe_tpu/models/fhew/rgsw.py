"""RGSW gadget encryptions and external/internal products
(reference `scheme/fhew/src/rgsw.rs`).

Layout: an RGSW ciphertext is 2d RLWE rows stacked on a leading axis:
(a: (..., 2d, N), b: (..., 2d, N)) in coefficient basis. Rows 0..d carry the
gadget powers added into the a-component, rows d..2d into b (`rgsw.rs:84-105`).

For the hot path (blind rotation) keys are pre-converted once to evaluation
basis + Montgomery domain (`RgswEval`); an external product then costs 2d
forward NTTs (the decomposed accumulator limbs), a (2d,N)x(2d,N)->(N)
Montgomery dot per output component, and 2 inverse NTTs -- the optimized
2d+2 transform schedule SURVEY.md §3.1 derives, vs the reference's 12d.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ...ops.gadget import decompose_zq, power_up_zq
from ...ops.modular import add_mod, mont_mul, sub_mod, sum_mod, to_montgomery, u64
from ...ops.ntt import intt, ntt
from .params import RgswParams
from .rlwe import RlweCiphertext, decrypt as rlwe_decrypt, pk_encrypt, sk_encrypt


class RgswCiphertext(NamedTuple):
    a: jnp.ndarray  # (..., 2d, N) coefficient basis
    b: jnp.ndarray  # (..., 2d, N)


class RgswEval(NamedTuple):
    """Evaluation-basis residency for external products: u32 + Shoup duals
    when the modulus fits 31 bits, else u64 Montgomery (duals None)."""

    a: jnp.ndarray  # (..., 2d, N)
    b: jnp.ndarray  # (..., 2d, N)
    a_dual: jnp.ndarray | None = None
    b_dual: jnp.ndarray | None = None


def add(params: RgswParams, ct0: RgswCiphertext, ct1: RgswCiphertext) -> RgswCiphertext:
    return RgswCiphertext(add_mod(ct0.a, ct1.a, params.q), add_mod(ct0.b, ct1.b, params.q))


def sub(params: RgswParams, ct0: RgswCiphertext, ct1: RgswCiphertext) -> RgswCiphertext:
    return RgswCiphertext(sub_mod(ct0.a, ct1.a, params.q), sub_mod(ct0.b, ct1.b, params.q))


def encode(params: RgswParams, m) -> jnp.ndarray:
    """Raw embed of Z_p values into Z_q, no delta scaling (`rgsw.rs:54-59`)."""
    return u64(m) % u64(params.q)


def decode(params: RgswParams, pt) -> jnp.ndarray:
    return u64(pt) % u64(params.p)


@partial(jax.jit, static_argnums=(0,))
def _add_powers(params: RgswParams, zeros_a, zeros_b, pt):
    d = params.gadget.d
    powers = jnp.moveaxis(power_up_zq(pt, params.gadget), 0, -2)  # (..., d, N)
    a = zeros_a.at[..., :d, :].set(add_mod(zeros_a[..., :d, :], powers, params.q))
    b = zeros_b.at[..., d:, :].set(add_mod(zeros_b[..., d:, :], powers, params.q))
    return a, b


def _encrypt(params: RgswParams, enc_zero, pt: jnp.ndarray) -> RgswCiphertext:
    """2d zero-encryptions + gadget powers of pt into a (rows 0..d) and b
    (rows d..2d) (`rgsw.rs:84-105`). pt: (..., N)."""
    zeros: RlweCiphertext = enc_zero()  # (..., 2d, N) each
    a, b = _add_powers(params, zeros.a, zeros.b, pt)
    return RgswCiphertext(a, b)


def sk_encrypt_rgsw(
    params: RgswParams, sk: np.ndarray, pt: jnp.ndarray, rng: np.random.Generator
) -> RgswCiphertext:
    d = params.gadget.d
    shape = (*pt.shape[:-1], 2 * d, params.n)

    def enc_zero():
        return sk_encrypt(params.rlwe, sk, jnp.zeros(shape, dtype=jnp.uint64), rng)

    return _encrypt(params, enc_zero, pt)


def pk_encrypt_rgsw(
    params: RgswParams, pk: RlweCiphertext, pt: jnp.ndarray, rng: np.random.Generator
) -> RgswCiphertext:
    d = params.gadget.d
    shape = (*pt.shape[:-1], 2 * d, params.n)

    def enc_zero():
        return pk_encrypt(params.rlwe, pk, jnp.zeros(shape, dtype=jnp.uint64), rng)

    return _encrypt(params, enc_zero, pt)


def decrypt_rgsw(params: RgswParams, sk: np.ndarray, ct: RgswCiphertext) -> jnp.ndarray:
    """Decrypt the last row, then rounding-shr by the top gadget base
    (`rgsw.rs:107-114`)."""
    last = RlweCiphertext(ct.a[..., -1, :], ct.b[..., -1, :])
    pt = rlwe_decrypt(params.rlwe, sk, last)
    # rounding_shr by the top gadget base (`decompose.rs:92-95`)
    bits = params.gadget.log_bases[-1]
    half = ((1 << bits) >> 1) % params.q
    rounded = add_mod(pt, u64(half), params.q)
    return rounded >> np.uint64(bits)


@partial(jax.jit, static_argnums=(0,))
def to_eval(params: RgswParams, ct: RgswCiphertext) -> RgswEval:
    """One-time NTT (+ Shoup duals / Montgomery) for key residency."""
    if params.use_u32:
        from ...ops.modular32 import shoup32_device
        from ...ops.ntt32 import ntt32

        ea = ntt32(u64(ct.a).astype(jnp.uint32), params.plan32)
        eb = ntt32(u64(ct.b).astype(jnp.uint32), params.plan32)
        return RgswEval(
            ea, eb, shoup32_device(ea, params.q), shoup32_device(eb, params.q)
        )
    zq = params.plan.zq
    return RgswEval(
        to_montgomery(ntt(ct.a, params.plan), zq),
        to_montgomery(ntt(ct.b, params.plan), zq),
    )


def decompose_rlwe(params: RgswParams, ct: RlweCiphertext) -> jnp.ndarray:
    """Stacked signed digits of (a, b): shape (..., 2d, N) (`rgsw.rs:122-124`)."""
    la = decompose_zq(ct.a, params.gadget)  # (d, ..., N)
    lb = decompose_zq(ct.b, params.gadget)
    limbs = jnp.concatenate([la, lb], axis=0)  # (2d, ..., N)
    return jnp.moveaxis(limbs, 0, -2)  # (..., 2d, N)


def external_product(
    params: RgswParams, key: RgswEval, ct: RlweCiphertext
) -> RlweCiphertext:
    """RGSW x RLWE -> RLWE (`rgsw.rs:116-128`), evaluation-basis schedule.
    u32 lanes with Shoup key products when q < 2^31 (output keeps the
    caller's ciphertext dtype), else u64 Montgomery."""
    if params.use_u32 and key.a_dual is not None:
        out32 = _external_product32(params, key, ct)
        if ct.a.dtype == jnp.uint32:
            return out32
        return RlweCiphertext(u64(out32.a), u64(out32.b))
    zq = params.plan.zq
    limbs = decompose_rlwe(params, ct)  # (..., 2d, N)
    limbs_eval = ntt(limbs, params.plan)
    a_eval = sum_mod(mont_mul(key.a, limbs_eval, zq), params.q, axis=-2)
    b_eval = sum_mod(mont_mul(key.b, limbs_eval, zq), params.q, axis=-2)
    return RlweCiphertext(intt(a_eval, params.plan), intt(b_eval, params.plan))


def _external_product32(
    params: RgswParams, key: RgswEval, ct: RlweCiphertext
) -> RlweCiphertext:
    from ...ops.gadget import decompose_zq32
    from ...ops.modular32 import mul_shoup32, sum_mod32
    from ...ops.ntt32 import intt32, ntt32

    q = params.q
    la = decompose_zq32(ct.a, params.gadget)  # (d, ..., N) u32
    lb = decompose_zq32(ct.b, params.gadget)
    limbs = jnp.moveaxis(jnp.concatenate([la, lb], axis=0), 0, -2)  # (..., 2d, N)
    limbs_eval = ntt32(limbs, params.plan32)
    a_eval = sum_mod32(mul_shoup32(limbs_eval, key.a, key.a_dual, q), q, axis=-2)
    b_eval = sum_mod32(mul_shoup32(limbs_eval, key.b, key.b_dual, q), q, axis=-2)
    return RlweCiphertext(intt32(a_eval, params.plan32), intt32(b_eval, params.plan32))


def internal_product(
    params: RgswParams, key: RgswEval, ct: RgswCiphertext
) -> RgswCiphertext:
    """RGSW x RGSW -> RGSW, used to merge multi-key brk shares
    (`rgsw.rs:130-150`): every row of ct goes through an external product
    against key."""
    if params.use_u32 and key.a_dual is not None:
        # each row of ct goes through an independent external product: the
        # batched row axis of _external_product32 does exactly that
        res = _external_product32(params, key, RlweCiphertext(ct.a, ct.b))
        return RgswCiphertext(u64(res.a), u64(res.b))
    zq = params.plan.zq
    limbs = jnp.concatenate(
        [decompose_zq(ct.a, params.gadget), decompose_zq(ct.b, params.gadget)],
        axis=0,
    )  # (2d_dec, ..., 2d_rows, N)
    limbs_eval = ntt(limbs, params.plan)
    # key rows (.., 2d, N): the 2d axis is the contraction (decomposition)
    # axis; move it leading and broadcast over ct's 2d_rows axis
    key_a = jnp.moveaxis(key.a, -2, 0)[..., None, :]
    key_b = jnp.moveaxis(key.b, -2, 0)[..., None, :]
    a_eval = sum_mod(mont_mul(key_a, limbs_eval, zq), params.q, axis=0)
    b_eval = sum_mod(mont_mul(key_b, limbs_eval, zq), params.q, axis=0)
    return RgswCiphertext(intt(a_eval, params.plan), intt(b_eval, params.plan))
