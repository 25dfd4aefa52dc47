"""Signed base-2^B gadget decomposition and power-up.

The carry/rounding rules reproduce the reference bit-for-bit
(`util/src/misc/decompose.rs:91-135`): digits live in (-B/2, B/2], produced
by a branch-free carry chain on two's-complement u64 lanes. This is the inner
loop of every external product and key switch, so it is written as d unrolled
vectorized steps over arbitrary batch shapes; the digit axis is emitted
leading so downstream NTT batches over it directly.

Zq variant (`decompose.rs:101-112`): start from the centered two's-complement
lift, carry when limb + (v&1) > B/2.
T64 variant (`decompose.rs:124-135`): branch-free carry
((limb-1 | v) & limb) >> (log_b - 1) on the raw u64.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import jax.numpy as jnp
import numpy as np

from .modular import add_mod, to_center_u64, u64


@dataclass(frozen=True)
class Gadget:
    """Base-2^B gadget for modulus q (q=0 means the 2^64 torus).

    rounding_bits = log_q - log_b*d, with log_q = ceil(log2(q)) for Zq and 64
    for the torus (`decompose.rs:50-81`).
    """

    q: int  # 0 => T64 torus (mod 2^64)
    log_b: int
    d: int
    log_q: int = field(init=False)
    rounding_bits: int = field(init=False)

    def __post_init__(self):
        log_q = 64 if self.q == 0 else (self.q - 1).bit_length()
        if self.q and (1 << log_q) < self.q:  # exact next_power_of_two semantics
            log_q += 1
        object.__setattr__(self, "log_q", log_q)
        object.__setattr__(
            self, "rounding_bits", max(log_q - self.log_b * self.d, 0)
        )

    @property
    def log_bases(self) -> list[int]:
        return [self.rounding_bits + i * self.log_b for i in range(self.d)]

    @property
    def bases(self) -> np.ndarray:
        """Gadget powers B^i * 2^rounding_bits (reduced mod q if q > 0)."""
        if self.q:
            return np.array(
                [pow(2, bits, self.q) for bits in self.log_bases], dtype=np.uint64
            )
        return np.array(
            [(1 << bits) % (1 << 64) for bits in self.log_bases], dtype=np.uint64
        )


def rounding_shr_zq(x: jnp.ndarray, gadget: Gadget) -> jnp.ndarray:
    """(x + 2^bits/2 mod q) >> bits, plain shift of the reduced value
    (`decompose.rs:92-95`)."""
    bits = gadget.rounding_bits
    if bits == 0:
        return u64(x)
    half = ((1 << bits) >> 1) % gadget.q
    rounded = add_mod(u64(x), u64(half), gadget.q)
    return rounded >> np.uint64(bits)


def decompose_zq(x: jnp.ndarray, gadget: Gadget) -> jnp.ndarray:
    """Signed digits of x mod q; returns shape (d, *x.shape), digits in [0, q).

    Exactly `decompose.rs:101-112`: v starts as the centered two's-complement
    lift of the rounded shift; each step extracts limb = v & mask, carries
    when limb + (v&1) > B/2, maps the digit into Zq as limb + carry*(q - B).
    """
    q = gadget.q
    log_b = gadget.log_b
    mask = np.uint64((1 << log_b) - 1)
    b_by_2 = np.uint64(1 << (log_b - 1))
    neg_b = np.uint64(q - (1 << log_b))
    one = np.uint64(1)

    v = rounding_shr_zq(x, gadget)
    v = to_center_u64(v, q)
    digits = []
    for _ in range(gadget.d):
        limb = v & mask
        carry = (limb + (v & one) > b_by_2).astype(jnp.uint64)
        v = (v >> np.uint64(log_b)) + carry
        # limb + carry*(q - B) is already in [0, q): no reduction needed
        digits.append(limb + carry * neg_b)
    return jnp.stack(digits, axis=0)


def decompose_zq_supports_u32(gadget: Gadget) -> bool:
    """The u32 walk emits digits identical to the u64 one whenever the whole
    digit span fits below the width difference (see decompose_zq32)."""
    return 0 < gadget.q < (1 << 31) and gadget.log_b * gadget.d <= 31


def decompose_zq32(x: jnp.ndarray, gadget: Gadget) -> jnp.ndarray:
    """u32-lane variant of `decompose_zq` for q < 2^31, log_b*d <= 31.

    Same op sequence on 32-bit lanes; digits depend only on the low
    log_b*(d-i) bits at each stage, which agree between widths under the
    gate above, so outputs are bit-identical to `decompose_zq`.
    """
    from .modular32 import add_mod32

    q = gadget.q
    log_b = gadget.log_b
    mask = np.uint32((1 << log_b) - 1)
    b_by_2 = np.uint32(1 << (log_b - 1))
    neg_b = np.uint32(q - (1 << log_b))
    one = np.uint32(1)

    x = x.astype(jnp.uint32)
    bits = gadget.rounding_bits
    if bits:
        half = np.uint32((((1 << bits) >> 1)) % q)
        x = add_mod32(x, half, q) >> np.uint32(bits)
    qq = np.uint32(q)
    v = jnp.where(x < (qq >> np.uint32(1)), x, x - qq)  # centered, 2s complement
    digits = []
    for _ in range(gadget.d):
        limb = v & mask
        carry = (limb + (v & one) > b_by_2).astype(jnp.uint32)
        v = (v >> np.uint32(log_b)) + carry
        digits.append(limb + carry * neg_b)
    return jnp.stack(digits, axis=0)


def decompose_t64(x: jnp.ndarray, gadget: Gadget) -> jnp.ndarray:
    """Signed digits of a torus value, branch-free carry (`decompose.rs:124-135`).

    Returns shape (d, *x.shape) as wrapping u64 digits.
    """
    log_b = gadget.log_b
    mask = np.uint64((1 << log_b) - 1)
    one = np.uint64(1)

    # rounding_shr for T64 (`decompose.rs:115-118`)
    bits = gadget.rounding_bits
    v = u64(x)
    if bits:
        v = (v + np.uint64((1 << bits) >> 1)) >> np.uint64(bits)

    digits = []
    for _ in range(gadget.d):
        limb = v & mask
        v = v >> np.uint64(log_b)
        carry = (((limb - one) | v) & limb) >> np.uint64(log_b - 1)
        v = v + carry
        digits.append(limb - (carry << np.uint64(log_b)))
    return jnp.stack(digits, axis=0)


def decompose_t64_supports_u32(gadget: Gadget) -> bool:
    """True when the torus decomposition never touches the low u64 word:
    rounding adds 2^(rb-1) with rb-1 >= 32 and all digits fit 31 bits."""
    return (
        gadget.q == 0
        and gadget.rounding_bits >= 33
        and gadget.log_b * gadget.d <= 31
    )


def decompose_t64_u32(x_hi: jnp.ndarray, gadget: Gadget) -> jnp.ndarray:
    """u32 fast path of `decompose_t64` for gadgets with rounding_bits >= 33:
    the rounded shift (x + 2^(rb-1)) >> rb only reads the HIGH u64 word, so
    the whole carry chain runs on native u32 lanes.

    x_hi: the high 32 bits of the torus values. Returns (d, *shape) u32
    digits in two's complement (|digit| <= B/2), bit-identical to the low
    words of `decompose_t64`'s output.
    """
    assert decompose_t64_supports_u32(gadget)
    log_b = gadget.log_b
    mask = np.uint32((1 << log_b) - 1)
    rb = gadget.rounding_bits
    v = (x_hi.astype(jnp.uint32) + np.uint32(1 << (rb - 33))) >> np.uint32(rb - 32)
    digits = []
    one = np.uint32(1)
    for _ in range(gadget.d):
        limb = v & mask
        v = v >> np.uint32(log_b)
        carry = (((limb - one) | v) & limb) >> np.uint32(log_b - 1)
        v = v + carry
        digits.append(limb - (carry << np.uint32(log_b)))
    return jnp.stack(digits, axis=0)


def power_up_zq(x: jnp.ndarray, gadget: Gadget) -> jnp.ndarray:
    """x * B^i * 2^rounding_bits mod q for i in 0..d; shape (d, *x.shape).

    `decompose.rs:35-40`. x must be already reduced mod q.
    """
    from .modular import ZqParams, mul_mod

    zq = ZqParams(gadget.q) if gadget.q % 2 == 1 else None
    outs = []
    for base in gadget.bases:
        if zq is not None:
            outs.append(mul_mod(u64(x), u64(int(base)), zq))
        elif gadget.q & (gadget.q - 1) == 0:  # power-of-two modulus
            outs.append((u64(x) * u64(int(base))) & np.uint64(gadget.q - 1))
        else:
            raise NotImplementedError("even non-power-of-two modulus")
    return jnp.stack(outs, axis=0)


def power_up_t64(x: jnp.ndarray, gadget: Gadget) -> jnp.ndarray:
    """x * 2^(rounding_bits + i*log_b) wrapping mod 2^64; shape (d, *x.shape)."""
    return jnp.stack([u64(x) * u64(int(b)) for b in gadget.bases], axis=0)
