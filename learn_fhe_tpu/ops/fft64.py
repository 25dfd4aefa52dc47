"""Torus polynomial multiplication through complex f64 FFT -- the reference's
path (`util/src/ring/fft/c64.rs`), kept for parity testing.

The production TPU path is `ops/torus_ntt.py` (exact, integer lanes); this
module reproduces the reference semantics instead: fold N torus values into
N/2 complex numbers with a half-twist (Formulas 8/10 of eprint 2021/480),
cyclic f64 FFT with bit-reversed twiddle indexing, and the deterministic
`f64_mod_u64` float->torus rounding via mantissa surgery (`c64.rs:69-85`).

Precision loss is bounded by 64 + log_b + log_n - 53 bits (`c64.rs:187-208`).
f64 and the u64 bitcast are software-emulated on TPU, so this path is mainly
exercised on CPU.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

from .modular import u64
from .ntt import bit_reverse_indices


@dataclass(frozen=True, eq=False)
class Fft64Plan:
    n: int  # torus polynomial length; complex length is n/2
    twist_re: np.ndarray  # (n/2,) cis(i*pi/n)
    twist_im: np.ndarray
    tw_re_bo: np.ndarray  # bit-reversed cis table, (n,) (`c64.rs:97-108`)
    tw_im_bo: np.ndarray


@lru_cache(maxsize=None)
def fft64_plan(n: int) -> Fft64Plan:
    i = np.arange(n // 2)
    ang = i * np.pi / n
    k = np.arange(n)
    full = k * np.pi / n
    rev = bit_reverse_indices(n)
    return Fft64Plan(
        n=n,
        twist_re=np.cos(ang),
        twist_im=np.sin(ang),
        tw_re_bo=np.cos(full)[rev],
        tw_im_bo=np.sin(full)[rev],
    )


def _cmul(ar, ai, br, bi):
    return ar * br - ai * bi, ar * bi + ai * br


def _fft(re, im, plan: Fft64Plan):
    """Cyclic DIT FFT, normal -> bit-reversed order (`fft.rs:9-18`): chunk j
    at every layer uses the bit-reversed table entry j."""
    m = re.shape[-1]
    batch = re.shape[:-1]
    log_m = m.bit_length() - 1
    for layer in reversed(range(log_m)):
        size = 1 << layer
        chunks = m >> (layer + 1)
        r = re.reshape(*batch, chunks, 2, size)
        i = im.reshape(*batch, chunks, 2, size)
        ar, ai = r[..., 0, :], i[..., 0, :]
        br, bi = r[..., 1, :], i[..., 1, :]
        tr = jnp.asarray(plan.tw_re_bo[:chunks])[:, None]
        ti = jnp.asarray(plan.tw_im_bo[:chunks])[:, None]
        tbr, tbi = _cmul(br, bi, tr, ti)
        re = jnp.stack([ar + tbr, ar - tbr], axis=-2).reshape(*batch, m)
        im = jnp.stack([ai + tbi, ai - tbi], axis=-2).reshape(*batch, m)
    return re, im


def _ifft(re, im, plan: Fft64Plan):
    """Inverse: bit-reversed -> normal order, conj twiddles, 1/m scale."""
    m = re.shape[-1]
    batch = re.shape[:-1]
    log_m = m.bit_length() - 1
    for layer in range(log_m):
        size = 1 << layer
        chunks = m >> (layer + 1)
        r = re.reshape(*batch, chunks, 2, size)
        i = im.reshape(*batch, chunks, 2, size)
        ar, ai = r[..., 0, :], i[..., 0, :]
        br, bi = r[..., 1, :], i[..., 1, :]
        tr = jnp.asarray(plan.tw_re_bo[:chunks])[:, None]
        ti = -jnp.asarray(plan.tw_im_bo[:chunks])[:, None]
        dr, di = _cmul(ar - br, ai - bi, tr, ti)
        re = jnp.stack([ar + br, dr], axis=-2).reshape(*batch, m)
        im = jnp.stack([ai + bi, di], axis=-2).reshape(*batch, m)
    return re / m, im / m


def f64_mod_u64(v: jnp.ndarray) -> jnp.ndarray:
    """Bit-exact f64 -> u64 with round-to-nearest via mantissa surgery
    (`c64.rs:69-85`)."""
    bits = jax.lax.bitcast_convert_type(v, jnp.uint64)
    sign = bits >> np.uint64(63)
    exponent = (bits >> np.uint64(52)) & np.uint64(0x7FF)
    mantissa = (bits << np.uint64(11)) | np.uint64(0x8000000000000000)
    shift = jnp.int64(1086) - exponent.astype(jnp.int64)
    # shift in [-63, 0]: mantissa << -shift
    val_left = mantissa << jnp.clip(-shift, 0, 63).astype(jnp.uint64)
    # shift in [1, 64]: ((mantissa >> (shift-1)) + 1) >> 1
    sh = jnp.clip(shift - 1, 0, 63).astype(jnp.uint64)
    val_right = ((mantissa >> sh) + np.uint64(1)) >> np.uint64(1)
    value = jnp.where(
        (shift >= -63) & (shift <= 0),
        val_left,
        jnp.where((shift >= 1) & (shift <= 64), val_right, np.uint64(0)),
    )
    return jnp.where(sign == 0, value, -value)


def to_c64_twisted(a: jnp.ndarray, plan: Fft64Plan):
    """Fold (..., n) torus into (..., n/2) complex with twist (`c64.rs:20-28`)."""
    half = plan.n // 2
    av = u64(a).astype(jnp.int64).astype(jnp.float64)  # centered lift
    lo, hi = av[..., :half], av[..., half:]
    return _cmul(lo, hi, jnp.asarray(plan.twist_re), jnp.asarray(plan.twist_im))


def from_c64_twisted(re, im, plan: Fft64Plan) -> jnp.ndarray:
    """Untwist and round back to torus (`c64.rs:31-41`)."""
    cr, ci = _cmul(re, im, jnp.asarray(plan.twist_re), -jnp.asarray(plan.twist_im))
    return jnp.concatenate([f64_mod_u64(cr), f64_mod_u64(ci)], axis=-1)


def negacyclic_fft64_mul(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """a(X)*b(X) mod (X^n+1, 2^64) through the float FFT (`c64.rs:11-56`)."""
    n = a.shape[-1]
    if n == 1:
        return u64(a) * u64(b)
    plan = fft64_plan(n)
    ar, ai = _fft(*to_c64_twisted(a, plan), plan)
    br, bi = _fft(*to_c64_twisted(b, plan), plan)
    cr, ci = _cmul(ar, ai, br, bi)
    cr, ci = _ifft(cr, ci, plan)
    return from_c64_twisted(cr, ci, plan)
