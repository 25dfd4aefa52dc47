"""u32 modular arithmetic lanes — the fast path for primes q < 2^31.

TPU vector ALUs are 32-bit: a u32 multiply is one native op, while u64
multiplies are emulated from 16-bit partial products (an XLA-emitted u64
modmul measures ~20x slower than the u32 equivalent on v5e). Every modulus
small enough to fit (FHEW's ciphertext primes, and the CRT primes used for
exact torus products in `torus_crt.py`) therefore runs on these lanes.

Reduction strategies (exact for q < 2^31):
- **Shoup multiplication** against precomputed constants (twiddles, key
  material in evaluation basis): one mulhi32 + two low muls.
- **Montgomery (REDC)** for variable x variable products.

All scalar constants are Python/NumPy scalars, never traced arrays: XLA
strength-reduces constant multiplies and shifts, which is worth an order of
magnitude on this path.

Reference semantics: `util/src/zq.rs:174-196` (widening modmul); this module
is the 32-bit engine underneath, not a translation.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import jax.numpy as jnp
import numpy as np

M16 = np.uint32(0xFFFF)
S16 = np.uint32(16)


def u32(x) -> jnp.ndarray:
    return jnp.asarray(x, dtype=jnp.uint32)


@dataclass(frozen=True)
class Zq32Params:
    """Precomputed reduction constants for one odd modulus q < 2^31."""

    q: int
    neg_q_inv: int = field(init=False)  # -q^-1 mod 2^32 (REDC)
    r1: int = field(init=False)  # 2^32 mod q
    r2: int = field(init=False)  # 2^64 mod q (enter/leave Montgomery)
    barrett_m: int = field(init=False)  # floor(2^32 / q)

    def __post_init__(self):
        assert self.q % 2 == 1 and 1 < self.q < (1 << 31)
        object.__setattr__(self, "neg_q_inv", (-pow(self.q, -1, 1 << 32)) % (1 << 32))
        object.__setattr__(self, "r1", (1 << 32) % self.q)
        object.__setattr__(self, "r2", (1 << 64) % self.q)
        object.__setattr__(self, "barrett_m", (1 << 32) // self.q)


def shoup32(w: int | np.ndarray, q: int) -> np.ndarray:
    """w' = floor(w * 2^32 / q) as u32 (host precompute for constants w < q)."""
    if q < (1 << 31):
        # w < q < 2^31 so w << 32 fits u64: pure vectorized numpy
        w_arr = np.asarray(w, dtype=np.uint64)
        return ((w_arr << np.uint64(32)) // np.uint64(q)).astype(np.uint32)
    w_arr = np.asarray(w, dtype=np.uint64).astype(object)
    return np.asarray((w_arr << 32) // q).astype(np.uint32)


def mulhi32(a: jnp.ndarray, b) -> jnp.ndarray:
    """High 32 bits of the 64-bit product a*b from 16-bit partial products."""
    a = u32(a)
    b = u32(b)
    a0, a1 = a & M16, a >> S16
    b0, b1 = b & M16, b >> S16
    ll = a0 * b0
    lh = a0 * b1
    hl = a1 * b0
    hh = a1 * b1
    mid = (ll >> S16) + (lh & M16) + (hl & M16)
    return hh + (lh >> S16) + (hl >> S16) + (mid >> S16)


def add_mod32(a, b, q: int) -> jnp.ndarray:
    """(a + b) mod q, inputs reduced; q < 2^31 so the u32 sum cannot wrap.

    min-trick: if s >= q then s-q < s, else s-q wraps above 2^31 > s, so
    min(s, s-q) is the reduced value in ONE vector op instead of cmp+select.
    """
    s = u32(a) + u32(b)
    return jnp.minimum(s, s - np.uint32(q))


def sub_mod32(a, b, q: int) -> jnp.ndarray:
    """(a - b) mod q via the min-trick: the unwrapped candidate is the
    smaller of d and d+q when both are viewed as u32."""
    d = u32(a) - u32(b)
    return jnp.minimum(d, d + np.uint32(q))


def neg_mod32(a, q: int) -> jnp.ndarray:
    """(-a) mod q via the min-trick: for a=0 the 0-a candidate wins (0);
    otherwise q-a < 2^31 < 2^32-a."""
    a = u32(a)
    return jnp.minimum(np.uint32(q) - a, np.uint32(0) - a)


def mul_shoup32(a, w, w_shoup, q: int) -> jnp.ndarray:
    """a * w mod q with (w, w_shoup) a precomputed Shoup pair, w < q, a < 2^32.

    r = a*w - floor(a*w_shoup / 2^32)*q lands in [0, 2q); one conditional
    subtract. Needs 2q <= 2^32, i.e. q < 2^31.
    """
    a = u32(a)
    hi = mulhi32(a, w_shoup)
    r = a * u32(w) - hi * np.uint32(q)
    return jnp.minimum(r, r - np.uint32(q))


def mul_shoup32_lazy(a, w, w_shoup, q: int) -> jnp.ndarray:
    """Shoup product left in [0, 2q) — for Harvey-style lazy butterflies."""
    a = u32(a)
    hi = mulhi32(a, w_shoup)
    return a * u32(w) - hi * np.uint32(q)


def _redc32(t_hi, t_lo, q: int, neg_q_inv: int) -> jnp.ndarray:
    """Montgomery reduction of t = t_hi*2^32 + t_lo -> t*2^-32 mod q, < 2q."""
    m = t_lo * np.uint32(neg_q_inv)
    mq_hi = mulhi32(m, np.uint32(q))
    carry = (t_lo != 0).astype(jnp.uint32)
    return t_hi + mq_hi + carry


def mul_mod32(a, b, zq: Zq32Params) -> jnp.ndarray:
    """General a * b mod q via two REDC passes; exact for q < 2^31."""
    a = u32(a)
    b = u32(b)
    qq = np.uint32(zq.q)
    t = _redc32(mulhi32(a, b), a * b, zq.q, zq.neg_q_inv)
    t = jnp.minimum(t, t - qq)
    r2 = np.uint32(zq.r2)
    out = _redc32(mulhi32(t, r2), t * r2, zq.q, zq.neg_q_inv)
    return jnp.minimum(out, out - qq)


def to_montgomery32(a, zq: Zq32Params) -> jnp.ndarray:
    """a * 2^32 mod q."""
    a = u32(a)
    r2 = np.uint32(zq.r2)
    t = _redc32(mulhi32(a, r2), a * r2, zq.q, zq.neg_q_inv)
    return jnp.minimum(t, t - np.uint32(zq.q))


def mont_mul32(a_mont, b, zq: Zq32Params) -> jnp.ndarray:
    """a_mont * b * 2^-32 mod q (plain product if a_mont is in the domain)."""
    a = u32(a_mont)
    b = u32(b)
    t = _redc32(mulhi32(a, b), a * b, zq.q, zq.neg_q_inv)
    return jnp.minimum(t, t - np.uint32(zq.q))


def barrett_reduce_u32(a, q: int) -> jnp.ndarray:
    """Reduce any u32 into [0, q) without division (q < 2^31)."""
    m = (1 << 32) // q
    hi = mulhi32(u32(a), np.uint32(m))
    r = u32(a) - hi * np.uint32(q)
    qq = np.uint32(q)
    r = jnp.minimum(r, r - qq)
    return jnp.minimum(r, r - qq)


def sum_mod32(x: jnp.ndarray, q: int, axis: int = 0) -> jnp.ndarray:
    """Sum of already-reduced values mod q along an axis (q < 2^31).

    Up to 2 terms fit a raw u32 sum; larger counts fold pairwise.
    """
    k = x.shape[axis]
    if k * (q - 1) < (1 << 32):
        return barrett_reduce_u32(jnp.sum(u32(x), axis=axis, dtype=jnp.uint32), q)
    x = jnp.moveaxis(u32(x), axis, 0)
    while x.shape[0] > 1:
        m = x.shape[0]
        if m % 2:
            x = jnp.concatenate([x, jnp.zeros_like(x[:1])], axis=0)
            m += 1
        x = add_mod32(x[: m // 2], x[m // 2 :], q)
    return x[0]


def u64_to_mod32(x: jnp.ndarray, q: int) -> jnp.ndarray:
    """Residue mod q of a raw u64 value interpreted UNSIGNED, using u32 ops.

    x = hi*2^32 + lo: r = (hi * (2^32 mod q) + lo) mod q.
    """
    c32 = (1 << 32) % q
    hi = (jnp.asarray(x, jnp.uint64) >> np.uint64(32)).astype(jnp.uint32)
    lo = jnp.asarray(x, jnp.uint64).astype(jnp.uint32)
    t = mul_shoup32(hi, np.uint32(c32), shoup32(c32, q)[()], q)
    lo_r = barrett_reduce_u32(lo, q)
    return add_mod32(t, lo_r, q)


def i64_to_mod32(x: jnp.ndarray, q: int) -> jnp.ndarray:
    """Residue mod q of a raw u64 interpreted as SIGNED two's complement
    (the centered torus representative): subtract 2^64 mod q when the sign
    bit is set."""
    r = u64_to_mod32(x, q)
    c64 = np.uint32((1 << 64) % q)
    neg = (jnp.asarray(x, jnp.uint64) >> np.uint64(63)).astype(jnp.uint32)
    return sub_mod32(r, neg * c64, q)


def shoup32_device(w: jnp.ndarray, q: int) -> jnp.ndarray:
    """floor(w * 2^32 / q) for reduced w < q < 2^31, computed ON DEVICE.

    Keygen-path helper (key material gets a Shoup dual once, then is reused
    every bootstrap): Barrett estimate t = mulhi64(w<<32, floor(2^64/q))
    undershoots by at most 2; fix with two conditional corrections.
    """
    from .modular import mulhi64  # u64 helper; acceptable off the hot path

    x = jnp.asarray(w, jnp.uint64) << np.uint64(32)
    m = np.uint64((1 << 64) // q)
    t = mulhi64(x, m)
    r = x - t * np.uint64(q)
    for _ in range(2):
        fix = r >= np.uint64(q)
        t = t + fix.astype(jnp.uint64)
        r = r - jnp.where(fix, np.uint64(q), np.uint64(0))
    return t.astype(jnp.uint32)


def small_i64_to_mod32(x: jnp.ndarray, q: int, bound_bits: int = 31) -> jnp.ndarray:
    """Residue mod q of a wrapping-u64 value KNOWN to be small and centered
    (|x| < 2^bound_bits <= 2^31, e.g. gadget digits): one add + compare."""
    assert bound_bits <= 31
    lo = jnp.asarray(x, jnp.uint64).astype(jnp.uint32)  # two's complement low word
    return small_u32_to_mod32(lo, q, bound_bits)


def small_u32_to_mod32(x: jnp.ndarray, q: int, bound_bits: int = 31) -> jnp.ndarray:
    """Residue mod q of a two's-complement u32 value with |x| < 2^bound_bits
    (gadget digits straight from the u32 decompose fast path)."""
    assert bound_bits <= 31
    x = u32(x)
    neg = x >> np.uint32(31)
    return jnp.where(neg.astype(bool), x + np.uint32(q), x)
