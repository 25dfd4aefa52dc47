"""RLWE over R_q, batched-array layout (reference `scheme/fhew/src/rlwe.rs`).

Ciphertext = (a: (..., N), b: (..., N)) u64 in COEFFICIENT basis.
Key-switching keys are stored in EVALUATION basis and Montgomery domain
(a TPU-first choice: the reference re-NTTs keys per multiply, we never do),
so a key switch costs d forward NTTs for the decomposed limbs, a pointwise
Montgomery dot over the digit axis, and two inverse NTTs.
"""

from __future__ import annotations

from functools import partial
from typing import Iterable, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ...ops.gadget import decompose_zq, power_up_zq
from ...ops.modular import (
    _round_half_away,
    add_mod,
    from_i64,
    mont_mul,
    neg_mod,
    sub_mod,
    sum_mod,
    to_center_i64,
    to_montgomery,
    u64,
)
from ...ops.ntt import intt, negacyclic_mul, ntt
from ...ops.poly import automorphism_i64, automorphism_zq, sample_extract_a
from ...utils.distributions import dg, uniform_zq, zo
from .lwe import LweCiphertext
from .params import RlweParams


class RlweCiphertext(NamedTuple):
    a: jnp.ndarray  # (..., N) coefficient basis
    b: jnp.ndarray  # (..., N)


class RlweKeySwitchingKey(NamedTuple):
    """Rows enc(-sk1 * B^i), evaluation-basis residency. For q < 2^31 the
    values are u32 with Shoup duals (6-mul pointwise products); for larger q
    they are u64 in the Montgomery domain and the duals are None."""

    a_eval: jnp.ndarray  # (d, N) evaluation basis
    b_eval: jnp.ndarray  # (d, N)
    a_dual: jnp.ndarray | None = None  # Shoup duals (u32 path only)
    b_dual: jnp.ndarray | None = None


class RlweAutoKey(NamedTuple):
    t: int
    ksk: RlweKeySwitchingKey


def add(params: RlweParams, ct0: RlweCiphertext, ct1: RlweCiphertext) -> RlweCiphertext:
    return RlweCiphertext(add_mod(ct0.a, ct1.a, params.q), add_mod(ct0.b, ct1.b, params.q))


def sub(params: RlweParams, ct0: RlweCiphertext, ct1: RlweCiphertext) -> RlweCiphertext:
    return RlweCiphertext(sub_mod(ct0.a, ct1.a, params.q), sub_mod(ct0.b, ct1.b, params.q))


# -- keygen / encode / encrypt / decrypt -------------------------------------


def sk_gen(params: RlweParams, rng: np.random.Generator) -> np.ndarray:
    return dg(3.2, 6, rng, params.n)


def pk_gen(params: RlweParams, sk: np.ndarray, rng: np.random.Generator) -> RlweCiphertext:
    """pk = encryption of zero (`rlwe.rs:98-101`)."""
    zero = jnp.zeros(params.n, dtype=jnp.uint64)
    return sk_encrypt(params, sk, zero, rng)


def encode(params: RlweParams, m) -> jnp.ndarray:
    m = u64(m)
    mc = to_center_i64(m, params.p).astype(jnp.float64)
    pt = _round_half_away(mc * jnp.float64(params.delta)).astype(jnp.int64)
    return (pt % jnp.int64(params.q)).astype(jnp.uint64)


def decode(params: RlweParams, pt) -> jnp.ndarray:
    ptc = to_center_i64(u64(pt), params.q).astype(jnp.float64)
    m = _round_half_away(ptc / jnp.float64(params.delta)).astype(jnp.int64)
    return (m % jnp.int64(params.p)).astype(jnp.uint64)


@partial(jax.jit, static_argnums=(0,))
def _sk_encrypt_core(params: RlweParams, a, sk_q, e, pt):
    return add_mod(
        add_mod(negacyclic_mul(a, sk_q, params.plan), e, params.q), pt, params.q
    )


def sk_encrypt(
    params: RlweParams, sk: np.ndarray, pt: jnp.ndarray, rng: np.random.Generator
) -> RlweCiphertext:
    """b = a*sk + e + pt (`rlwe.rs:146-156`); pt may be batched (..., N)."""
    pt = u64(pt)
    shape = pt.shape
    a = jnp.asarray(uniform_zq(params.q, rng, shape))
    e = from_i64(jnp.asarray(dg(3.2, 6, rng, shape)), params.q)
    sk_q = from_i64(jnp.asarray(sk), params.q)
    return RlweCiphertext(a, _sk_encrypt_core(params, a, sk_q, e, pt))


@partial(jax.jit, static_argnums=(0,))
def _pk_encrypt_core(params: RlweParams, pk_a, pk_b, u, e0, e1, pt):
    a = add_mod(negacyclic_mul(pk_a, u, params.plan), e0, params.q)
    b = add_mod(
        add_mod(negacyclic_mul(pk_b, u, params.plan), e1, params.q), pt, params.q
    )
    return a, b


def pk_encrypt(
    params: RlweParams, pk: RlweCiphertext, pt: jnp.ndarray, rng: np.random.Generator
) -> RlweCiphertext:
    """a = pk.a*u + e0, b = pk.b*u + e1 + pt with u ~ zo(0.5) (`rlwe.rs:158-170`)."""
    pt = u64(pt)
    shape = pt.shape
    u = from_i64(jnp.asarray(zo(0.5, rng, shape)), params.q)
    e0 = from_i64(jnp.asarray(dg(3.2, 6, rng, shape)), params.q)
    e1 = from_i64(jnp.asarray(dg(3.2, 6, rng, shape)), params.q)
    a, b = _pk_encrypt_core(params, u64(pk.a), u64(pk.b), u, e0, e1, pt)
    return RlweCiphertext(a, b)


@partial(jax.jit, static_argnums=(0,))
def _decrypt_core(params: RlweParams, a, b, sk_q):
    return sub_mod(b, negacyclic_mul(a, sk_q, params.plan), params.q)


def decrypt(params: RlweParams, sk: np.ndarray, ct: RlweCiphertext) -> jnp.ndarray:
    sk_q = from_i64(jnp.asarray(sk), params.q)
    return _decrypt_core(params, u64(ct.a), u64(ct.b), sk_q)


# -- key switching / automorphism / extraction -------------------------------


@partial(jax.jit, static_argnums=(0,))
def _to_eval_mont(params: RlweParams, x: jnp.ndarray) -> jnp.ndarray:
    return to_montgomery(ntt(x, params.plan), params.plan.zq)


@partial(jax.jit, static_argnums=(0,))
def make_ksk(params: RlweParams, ct: RlweCiphertext) -> RlweKeySwitchingKey:
    """Move a coefficient-basis key ciphertext into hot-loop residency:
    u32 eval + Shoup duals when the modulus fits, else u64 eval-Montgomery."""
    if params.use_u32:
        from ...ops.modular32 import shoup32_device
        from ...ops.ntt32 import ntt32

        ea = ntt32(u64(ct.a).astype(jnp.uint32), params.plan32)
        eb = ntt32(u64(ct.b).astype(jnp.uint32), params.plan32)
        return RlweKeySwitchingKey(
            ea, eb, shoup32_device(ea, params.q), shoup32_device(eb, params.q)
        )
    return RlweKeySwitchingKey(
        _to_eval_mont(params, ct.a), _to_eval_mont(params, ct.b)
    )


def ksk_gen(
    params: RlweParams, sk0: np.ndarray, sk1: np.ndarray, rng: np.random.Generator
) -> RlweKeySwitchingKey:
    """rows = enc_{sk0}(-sk1 * B^i) (`rlwe.rs:109-120`), stored in eval basis."""
    neg_sk1 = from_i64(jnp.asarray(-np.asarray(sk1)), params.q)
    pt = power_up_zq(neg_sk1, params.gadget)  # (d, N)
    ct = sk_encrypt(params, sk0, pt, rng)
    return make_ksk(params, ct)


def ak_gen(
    params: RlweParams, t: int, sk: np.ndarray, rng: np.random.Generator
) -> RlweAutoKey:
    """Automorphism key: ksk from sk to sk o (X -> X^t) (`rlwe.rs:122-132`)."""
    assert t != 0
    sk_auto = automorphism_i64(np.asarray(sk), t)
    return RlweAutoKey(t, ksk_gen(params, sk, sk_auto, rng))


def key_switch(
    params: RlweParams, ksk: RlweKeySwitchingKey, ct: RlweCiphertext
) -> RlweCiphertext:
    """a' = sum_i decomp_i(a) * ksk.a_i, b' = sum_i ... + b (`rlwe.rs:177-186`).

    Dispatches on modulus size: u32 lanes with Shoup key products when
    q < 2^31 (preserving the caller's ciphertext dtype), else u64 Montgomery.
    """
    if params.use_u32 and ksk.a_dual is not None:
        out32 = _key_switch32(params, ksk, ct)
        if ct.a.dtype == jnp.uint32:
            return out32
        return RlweCiphertext(u64(out32.a), u64(out32.b))
    zq = params.plan.zq
    limbs = decompose_zq(ct.a, params.gadget)  # (d, ..., N)
    limbs_eval = ntt(limbs, params.plan)
    # digit axis leads; move batch in between for broadcasting against (d, N)
    ksk_a = ksk.a_eval.reshape(params.gadget.d, *([1] * (limbs.ndim - 2)), params.n)
    ksk_b = ksk.b_eval.reshape(params.gadget.d, *([1] * (limbs.ndim - 2)), params.n)
    a_eval = sum_mod(mont_mul(ksk_a, limbs_eval, zq), params.q, axis=0)
    b_eval = sum_mod(mont_mul(ksk_b, limbs_eval, zq), params.q, axis=0)
    a = intt(a_eval, params.plan)
    b = add_mod(intt(b_eval, params.plan), ct.b, params.q)
    return RlweCiphertext(a, b)


def _key_switch32(
    params: RlweParams, ksk: RlweKeySwitchingKey, ct: RlweCiphertext
) -> RlweCiphertext:
    from ...ops.gadget import decompose_zq32
    from ...ops.modular32 import add_mod32, mul_shoup32, sum_mod32
    from ...ops.ntt32 import intt32, ntt32

    q = params.q
    limbs = decompose_zq32(ct.a, params.gadget)  # (d, ..., N) u32
    limbs_eval = ntt32(limbs, params.plan32)
    shape = (params.gadget.d, *([1] * (limbs.ndim - 2)), params.n)
    a_eval = sum_mod32(
        mul_shoup32(limbs_eval, ksk.a_eval.reshape(shape), ksk.a_dual.reshape(shape), q),
        q,
        axis=0,
    )
    b_eval = sum_mod32(
        mul_shoup32(limbs_eval, ksk.b_eval.reshape(shape), ksk.b_dual.reshape(shape), q),
        q,
        axis=0,
    )
    a = intt32(a_eval, params.plan32)
    b = add_mod32(intt32(b_eval, params.plan32), ct.b.astype(jnp.uint32), q)
    return RlweCiphertext(a, b)


@partial(jax.jit, static_argnums=(0, 1))
def _automorphism_core(
    params: RlweParams, t: int, ksk: RlweKeySwitchingKey, ct: RlweCiphertext
) -> RlweCiphertext:
    ct_auto = RlweCiphertext(
        automorphism_zq(ct.a, t, params.q), automorphism_zq(ct.b, t, params.q)
    )
    return key_switch(params, ksk, ct_auto)


def automorphism(params: RlweParams, ak: RlweAutoKey, ct: RlweCiphertext) -> RlweCiphertext:
    """Map X -> X^t then switch back to sk (`rlwe.rs:188-191`)."""
    return _automorphism_core(params, ak.t, ak.ksk, ct)


def sample_extract(params: RlweParams, ct: RlweCiphertext, i: int) -> LweCiphertext:
    """Extract coefficient i as an N-dim LWE ciphertext (`rlwe.rs:193-202`)."""
    assert 0 <= i < params.n
    return LweCiphertext(sample_extract_a(ct.a, i, params.q), ct.b[..., i])


# -- threshold / multi-party API (`rlwe.rs:219-324`) -------------------------


def share_encrypt(
    params: RlweParams,
    a: jnp.ndarray,
    sk: np.ndarray,
    pt: jnp.ndarray,
    rng: np.random.Generator,
) -> jnp.ndarray:
    """b-share = a*sk + e + pt under common a (`rlwe.rs:239-249`)."""
    e_i64 = jnp.asarray(dg(3.2, 6, rng, u64(pt).shape))
    sk_i64 = jnp.asarray(np.asarray(sk, dtype=np.int64))
    return _share_encrypt_core(params, u64(a), sk_i64, e_i64, u64(pt))


@partial(jax.jit, static_argnums=(0,))
def _share_encrypt_core(params: RlweParams, a, sk_i64, e_i64, pt):
    e = from_i64(e_i64, params.q)
    sk_q = from_i64(sk_i64, params.q)
    return add_mod(
        add_mod(negacyclic_mul(a, sk_q, params.plan), e, params.q), pt, params.q
    )


def encryption_share_merge(
    params: RlweParams, a: jnp.ndarray, shares: Iterable[jnp.ndarray]
) -> RlweCiphertext:
    b = None
    for s in shares:
        b = s if b is None else add_mod(b, s, params.q)
    return RlweCiphertext(a, b)


def pk_share_gen(
    params: RlweParams, a: jnp.ndarray, sk: np.ndarray, rng: np.random.Generator
) -> jnp.ndarray:
    zero = jnp.zeros(params.n, dtype=jnp.uint64)
    return share_encrypt(params, a, sk, zero, rng)


def pk_share_merge(
    params: RlweParams, a: jnp.ndarray, shares: Iterable[jnp.ndarray]
) -> RlweCiphertext:
    return encryption_share_merge(params, a, shares)


def share_decrypt(
    params: RlweParams, sk: np.ndarray, a: jnp.ndarray, rng: np.random.Generator
) -> jnp.ndarray:
    e = from_i64(jnp.asarray(dg(3.2, 6, rng, a.shape)), params.q)
    sk_q = from_i64(jnp.asarray(sk), params.q)
    return add_mod(negacyclic_mul(a, sk_q, params.plan), e, params.q)


def decryption_share_merge(
    params: RlweParams, b: jnp.ndarray, shares: Iterable[jnp.ndarray]
) -> jnp.ndarray:
    acc = None
    for s in shares:
        acc = s if acc is None else add_mod(acc, s, params.q)
    return sub_mod(u64(b), acc, params.q)


def ksk_share_gen(
    params: RlweParams,
    crs_a: jnp.ndarray,
    sk0: np.ndarray,
    sk1: np.ndarray,
    rng: np.random.Generator,
) -> jnp.ndarray:
    """b-shares (d, N) of enc(-sk1 * B^i) under common a rows (`rlwe.rs:280-292`)."""
    neg_sk1 = from_i64(jnp.asarray(-np.asarray(sk1)), params.q)
    pt = power_up_zq(neg_sk1, params.gadget)
    return share_encrypt(params, crs_a, sk0, pt, rng)


def ksk_share_merge(
    params: RlweParams, crs_a: jnp.ndarray, shares: Iterable[jnp.ndarray]
) -> RlweKeySwitchingKey:
    ct = encryption_share_merge(params, crs_a, shares)
    return RlweKeySwitchingKey(
        _to_eval_mont(params, ct.a), _to_eval_mont(params, ct.b)
    )


def ak_share_gen(
    params: RlweParams,
    t: int,
    crs_a: jnp.ndarray,
    sk: np.ndarray,
    rng: np.random.Generator,
) -> jnp.ndarray:
    sk_auto = automorphism_i64(np.asarray(sk), t)
    return ksk_share_gen(params, crs_a, sk, sk_auto, rng)


def ak_share_merge(
    params: RlweParams, t: int, crs_a: jnp.ndarray, shares: Iterable[jnp.ndarray]
) -> RlweAutoKey:
    return RlweAutoKey(t, ksk_share_merge(params, crs_a, shares))
