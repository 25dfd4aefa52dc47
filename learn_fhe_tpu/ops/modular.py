"""u64 modular arithmetic lanes for TPU.

TPU vector ALUs are 32-bit; XLA emulates u64 with u32 limb pairs. Every
reduction here is therefore built from operations that map to cheap 32-bit
limb arithmetic: wrapping u64 multiply, `mulhi64` (4 partial products), adds,
shifts, compares. No u128, no division on the device path.

Reduction strategies (all exact for q < 2^63):
- **Shoup multiplication** for products against *precomputed constants*
  (NTT twiddles, fixed key polynomials): one mulhi + two low muls.
- **Montgomery (REDC)** for general variable x variable products
  (ciphertext pointwise muls): two REDC passes against precomputed
  ``-q^-1 mod 2^64`` and ``2^128 mod q``.

Semantics of `mod_switch` / `mod_switch_odd` / centered lifts follow the
reference `util/src/zq.rs:71-140` bit-for-bit (f64 rounding included).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import jax.numpy as jnp
import numpy as np

# numpy scalar, NOT jnp: a module-scope jnp constant commits the XLA backend
# at import time, which breaks jax.distributed.initialize (must run before
# any backend touch — parallel/distributed.py, tests/distributed_worker.py).
MASK32 = np.uint64(0xFFFFFFFF)
U64 = jnp.uint64


def u64(x) -> jnp.ndarray:
    return jnp.asarray(x, dtype=jnp.uint64)


# ---------------------------------------------------------------------------
# Host-side per-modulus precomputation
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class ZqParams:
    """Pure precomputed reduction constants for one prime modulus q < 2^63."""

    q: int
    neg_q_inv: int = field(init=False)  # -q^-1 mod 2^64 (for REDC)
    r1: int = field(init=False)  # 2^64 mod q (Montgomery one)
    r2: int = field(init=False)  # 2^128 mod q (to leave Montgomery domain)

    def __post_init__(self):
        assert self.q % 2 == 1 and 1 < self.q < (1 << 63)
        object.__setattr__(self, "neg_q_inv", (-pow(self.q, -1, 1 << 64)) % (1 << 64))
        object.__setattr__(self, "r1", (1 << 64) % self.q)
        object.__setattr__(self, "r2", (1 << 128) % self.q)


def shoup_precompute(w: int | np.ndarray, q: int) -> np.ndarray:
    """w' = floor(w * 2^64 / q) as u64, for Shoup constant multiplication."""
    w_arr = np.asarray(w, dtype=object)
    out = np.empty(w_arr.shape, dtype=np.uint64)
    flat_w, flat_o = w_arr.reshape(-1), out.reshape(-1)
    for i in range(flat_w.size):
        flat_o[i] = (int(flat_w[i]) << 64) // q
    return out if w_arr.shape else out.reshape(())


# ---------------------------------------------------------------------------
# Device-side u64 primitives
# ---------------------------------------------------------------------------


def mulhi64(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """High 64 bits of the 128-bit product a*b (u64 inputs)."""
    a = u64(a)
    b = u64(b)
    a_lo, a_hi = a & MASK32, a >> np.uint64(32)
    b_lo, b_hi = b & MASK32, b >> np.uint64(32)
    ll = a_lo * b_lo
    lh = a_lo * b_hi
    hl = a_hi * b_lo
    hh = a_hi * b_hi
    mid = (ll >> np.uint64(32)) + (lh & MASK32) + (hl & MASK32)
    return hh + (lh >> np.uint64(32)) + (hl >> np.uint64(32)) + (mid >> np.uint64(32))


def add_mod(a, b, q) -> jnp.ndarray:
    """(a + b) mod q, inputs already reduced, q < 2^63 so no u64 overflow.

    min-trick: the wrong candidate wraps above 2^63, so minimum() picks the
    reduced value in one vector op instead of compare+select."""
    s = u64(a) + u64(b)
    return jnp.minimum(s, s - u64(q))


def sub_mod(a, b, q) -> jnp.ndarray:
    """(a - b) mod q, inputs already reduced (min-trick, see add_mod)."""
    d = u64(a) - u64(b)
    return jnp.minimum(d, d + u64(q))


def neg_mod(a, q) -> jnp.ndarray:
    """(-a) mod q, input already reduced (maps 0 -> 0; min-trick)."""
    a = u64(a)
    return jnp.minimum(u64(q) - a, u64(0) - a)


def mul_shoup(a, w, w_shoup, q) -> jnp.ndarray:
    """a * w mod q where (w, w_shoup) is a precomputed Shoup pair.

    r = a*w - floor(a*w_shoup / 2^64)*q, then one conditional subtract.
    Exact for q < 2^63.
    """
    a = u64(a)
    w = u64(w)
    hi = mulhi64(a, u64(w_shoup))
    r = a * w - hi * u64(q)  # both wrapping u64
    return jnp.minimum(r, r - u64(q))


def _redc(t_hi, t_lo, q, neg_q_inv) -> jnp.ndarray:
    """Montgomery reduction of t = t_hi*2^64 + t_lo; returns t*2^-64 mod q.

    Result < 2q; callers conditional-subtract.
    """
    m = t_lo * u64(neg_q_inv)  # wrapping
    mq_hi = mulhi64(m, u64(q))
    carry = (t_lo != 0).astype(jnp.uint64)
    return t_hi + mq_hi + carry


def mul_mod(a, b, zq: ZqParams) -> jnp.ndarray:
    """General a * b mod q via two REDC passes. Exact for q < 2^63."""
    a = u64(a)
    b = u64(b)
    q, neg_q_inv = zq.q, zq.neg_q_inv
    # t = a*b*R^-1 mod q
    t = _redc(mulhi64(a, b), a * b, q, neg_q_inv)
    qq = u64(q)
    t = jnp.minimum(t, t - qq)
    # result = t*r2*R^-1 = a*b mod q
    r2 = u64(zq.r2)
    out = _redc(mulhi64(t, r2), t * r2, q, neg_q_inv)
    return jnp.minimum(out, out - qq)


def to_montgomery(a, zq: ZqParams) -> jnp.ndarray:
    """a * 2^64 mod q (enter Montgomery domain)."""
    r2 = u64(zq.r2)
    a = u64(a)
    t = _redc(mulhi64(a, r2), a * r2, zq.q, zq.neg_q_inv)
    return jnp.minimum(t, t - u64(zq.q))


def mont_mul(a_mont, b, zq: ZqParams) -> jnp.ndarray:
    """a_mont * b * 2^-64 mod q: if a_mont is in Montgomery domain the result
    is the plain product a*b mod q."""
    a = u64(a_mont)
    b = u64(b)
    t = _redc(mulhi64(a, b), a * b, zq.q, zq.neg_q_inv)
    return jnp.minimum(t, t - u64(zq.q))


# ---------------------------------------------------------------------------
# Lifts and modulus switching (reference `zq.rs:71-140` semantics)
# ---------------------------------------------------------------------------


def to_center_i64(a, q) -> jnp.ndarray:
    """Centered lift to signed: v if v < q/2 else v - q (`zq.rs:71-77`)."""
    a = u64(a)
    qq = u64(q)
    return jnp.where(a < (qq >> np.uint64(1)), a, a - qq).astype(jnp.int64)


def to_center_u64(a, q) -> jnp.ndarray:
    """Centered lift as two's-complement u64 (`zq.rs:83-89`)."""
    a = u64(a)
    qq = u64(q)
    return jnp.where(a < (qq >> np.uint64(1)), a, a - qq)


def from_i64(v, q) -> jnp.ndarray:
    """Reduce signed values into [0, q)."""
    v = jnp.asarray(v, dtype=jnp.int64)
    q_i = jnp.int64(q)
    r = v % q_i  # jnp % follows Python sign semantics: result in [0, q)
    return r.astype(jnp.uint64)


def mod_switch(a, q: int, q_prime: int) -> jnp.ndarray:
    """round(v * q'/q) mod q', f64 rounding half away from zero
    (`zq.rs:128-130`: from_f64 -> v.round() -> rem_euclid)."""
    v = u64(a).astype(jnp.float64)
    # match (v as f64 * q' as f64) / q as f64 exactly: single mul then div
    scaled = (v * jnp.float64(float(q_prime))) / jnp.float64(float(q))
    rounded = _round_half_away(scaled).astype(jnp.int64)
    return (rounded % jnp.int64(q_prime)).astype(jnp.uint64)


def mod_switch_odd(a, q: int, q_prime: int) -> jnp.ndarray:
    """Round down then force odd, except round-to-nearest when floor == 0
    (`zq.rs:132-140`)."""
    v = u64(a).astype(jnp.float64)
    scaled = (v * jnp.float64(float(q_prime))) / jnp.float64(float(q))
    fl = jnp.floor(scaled)
    rounded = _round_half_away(scaled).astype(jnp.uint64)
    odd = fl.astype(jnp.uint64) | np.uint64(1)
    out = jnp.where(fl == 0.0, rounded, odd)
    return out % u64(q_prime)


def _round_half_away(x: jnp.ndarray) -> jnp.ndarray:
    """Rust f64::round(): round half away from zero (jnp.round is half-even).

    Branch form (no copysign: its bitcast path doesn't lower for x64 on TPU).
    """
    half = jnp.float64(0.5)
    return jnp.where(x >= 0, jnp.floor(x + half), jnp.ceil(x - half))


def is_pow2(q: int) -> bool:
    return q & (q - 1) == 0


def generic_mul_mod(a, b, q: int) -> jnp.ndarray:
    """a * b mod q for any q < 2^63: mask for powers of two, REDC for odd."""
    if is_pow2(q):
        return (u64(a) * u64(b)) & u64(q - 1)
    if q % 2 == 1:
        return mul_mod(a, b, ZqParams(q))
    raise NotImplementedError("even non-power-of-two modulus")


def sum_mod(x: jnp.ndarray, q: int, axis: int = 0) -> jnp.ndarray:
    """Sum of already-reduced values mod q along an axis.

    Powers of two wrap for free; odd moduli accumulate raw u64 when the term
    count can't overflow, else fold with a log-depth modular tree.
    """
    if is_pow2(q):
        return jnp.sum(u64(x), axis=axis) & u64(q - 1)
    k = x.shape[axis]
    if k * (q - 1) < (1 << 64):
        return barrett_reduce_u64(jnp.sum(u64(x), axis=axis), q)
    x = jnp.moveaxis(u64(x), axis, 0)
    while x.shape[0] > 1:
        m = x.shape[0]
        if m % 2:
            x = jnp.concatenate([x, jnp.zeros_like(x[:1])], axis=0)
            m += 1
        x = add_mod(x[: m // 2], x[m // 2 :], q)
    return x[0]


def modular_dot(x: jnp.ndarray, mat: jnp.ndarray, q: int) -> jnp.ndarray:
    """Contraction sum_k x[..., k] * mat[k] (mat: (K,) or (K, M)) mod q.

    Power-of-two moduli accumulate with wrapping u64 multiplies + sum (mod
    2^64 then mask is exact); odd moduli reduce each product then modular-sum.
    NOTE: no einsum/dot_general here -- XLA's x64 rewriter cannot lower u64
    dots on TPU, but broadcast-mul + reduce lowers fine.
    """
    if is_pow2(q):
        if mat.ndim == 1:
            return jnp.sum(u64(x) * u64(mat), axis=-1) & u64(q - 1)
        return jnp.sum(u64(x)[..., :, None] * u64(mat), axis=-2) & u64(q - 1)
    if mat.ndim == 1:
        terms = generic_mul_mod(x, mat, q)  # (..., K)
        return sum_mod(terms, q, axis=-1)
    terms = generic_mul_mod(x[..., :, None], mat, q)  # (..., K, M)
    return sum_mod(terms, q, axis=-2)


def barrett_reduce_u64(a, q: int) -> jnp.ndarray:
    """Reduce arbitrary u64 values into [0, q) without division.

    Uses the Shoup pair of w=1? No: computes floor(a/q) via mulhi with
    m = floor(2^64/q), then up to two corrections. Exact for q < 2^63.
    """
    m = (1 << 64) // q
    hi = mulhi64(u64(a), u64(m))
    r = u64(a) - hi * u64(q)
    qq = u64(q)
    r = jnp.minimum(r, r - qq)
    return jnp.minimum(r, r - qq)
