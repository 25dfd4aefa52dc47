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


def _r2_fwd(out, batch, n, q, plan, layer):
    m = 1 << layer
    half = n >> (layer + 1)
    x = out.reshape(*batch, m, 2, half)
    u, v = x[..., 0, :], x[..., 1, :]
    t = plan.psi_br[m : 2 * m][:, None]  # np constant -> HLO constant
    ts = plan.psi_br_shoup[m : 2 * m][:, None]
    tv = mul_shoup32(v, t, ts, q)
    return jnp.stack([add_mod32(u, tv, q), sub_mod32(u, tv, q)], axis=-2).reshape(
        *batch, n
    )


def _r4_fwd(out, batch, n, q, plan, layer):
    """Two DIT layers (layer, layer+1) fused in ONE memory pass — the
    pipeline is HBM-bound, so halving stage round-trips ~halves NTT time
    at identical multiply count."""
    m = 1 << layer
    quarter = n >> (layer + 2)
    x = out.reshape(*batch, m, 4, quarter)
    x0, x1, x2, x3 = (x[..., i, :] for i in range(4))
    w1 = plan.psi_br[m : 2 * m][:, None]
    w1s = plan.psi_br_shoup[m : 2 * m][:, None]
    w2 = plan.psi_br[2 * m : 4 * m].reshape(m, 2)
    w2s = plan.psi_br_shoup[2 * m : 4 * m].reshape(m, 2)
    t2 = mul_shoup32(x2, w1, w1s, q)
    t3 = mul_shoup32(x3, w1, w1s, q)
    a0 = add_mod32(x0, t2, q)
    a1 = add_mod32(x1, t3, q)
    b0 = sub_mod32(x0, t2, q)
    b1 = sub_mod32(x1, t3, q)
    u1 = mul_shoup32(a1, w2[:, 0:1], w2s[:, 0:1], q)
    u3 = mul_shoup32(b1, w2[:, 1:2], w2s[:, 1:2], q)
    return jnp.stack(
        [
            add_mod32(a0, u1, q),
            sub_mod32(a0, u1, q),
            add_mod32(b0, u3, q),
            sub_mod32(b0, u3, q),
        ],
        axis=-2,
    ).reshape(*batch, n)


def _r8_fwd(out, batch, n, q, plan, layer):
    """Three DIT layers fused in one memory pass (12 muls / 8 outputs, the
    same multiply count as three radix-2 passes at a third of the traffic)."""
    m = 1 << layer
    eighth = n >> (layer + 3)
    x = out.reshape(*batch, m, 8, eighth)
    xs = [x[..., i, :] for i in range(8)]
    w1 = plan.psi_br[m : 2 * m][:, None]
    w1s = plan.psi_br_shoup[m : 2 * m][:, None]
    w2 = plan.psi_br[2 * m : 4 * m].reshape(m, 2)
    w2s = plan.psi_br_shoup[2 * m : 4 * m].reshape(m, 2)
    w3 = plan.psi_br[4 * m : 8 * m].reshape(m, 4)
    w3s = plan.psi_br_shoup[4 * m : 8 * m].reshape(m, 4)

    t = [mul_shoup32(xs[i + 4], w1, w1s, q) for i in range(4)]
    a = [add_mod32(xs[i], t[i], q) for i in range(4)]
    b = [sub_mod32(xs[i], t[i], q) for i in range(4)]
    ta = [mul_shoup32(a[i + 2], w2[:, 0:1], w2s[:, 0:1], q) for i in range(2)]
    tb = [mul_shoup32(b[i + 2], w2[:, 1:2], w2s[:, 1:2], q) for i in range(2)]
    c = [add_mod32(a[i], ta[i], q) for i in range(2)]
    d = [sub_mod32(a[i], ta[i], q) for i in range(2)]
    e = [add_mod32(b[i], tb[i], q) for i in range(2)]
    f = [sub_mod32(b[i], tb[i], q) for i in range(2)]
    outs = []
    for blkpair, w_idx in ((c, 0), (d, 1), (e, 2), (f, 3)):
        tt = mul_shoup32(blkpair[1], w3[:, w_idx : w_idx + 1], w3s[:, w_idx : w_idx + 1], q)
        outs.append(add_mod32(blkpair[0], tt, q))
        outs.append(sub_mod32(blkpair[0], tt, q))
    return jnp.stack(outs, axis=-2).reshape(*batch, n)


# Widest fused pass. Measured on v5e at the TFHE reference pipeline:
# radix-2 -> 246 PBS/s, radix-4 -> 287, radix-8 -> 282 (register pressure
# eats the traffic win past two fused layers), so radix-4 is the default.
_PASS_WIDTH = 2


def _fwd_schedule(log_n: int) -> list[int]:
    """Radix schedule (layer-counts per pass): greedy _PASS_WIDTH-wide
    passes with the remainder covered by narrower ones."""
    sched = []
    rem = log_n
    while rem >= _PASS_WIDTH:
        sched.append(_PASS_WIDTH)
        rem -= _PASS_WIDTH
    if rem:
        sched.append(rem)
    return sched


def ntt32(a: jnp.ndarray, plan: Ntt32Plan) -> jnp.ndarray:
    """Forward negacyclic NTT over the last axis (normal -> bit-reversed);
    layers run in fused radix-8/4/2 passes (the pipeline is HBM-bound, so
    fewer memory passes at constant multiply count win ~linearly)."""
    n, q = plan.n, plan.q
    if n == 1:
        return u32(a)
    batch = a.shape[:-1]
    out = u32(a)
    layer = 0
    for width in _fwd_schedule(plan.log_n):
        if width == 3:
            out = _r8_fwd(out, batch, n, q, plan, layer)
        elif width == 2:
            out = _r4_fwd(out, batch, n, q, plan, layer)
        else:
            out = _r2_fwd(out, batch, n, q, plan, layer)
        layer += width
    return out


def _r2_inv(out, batch, n, q, plan, layer):
    m = 1 << layer
    half = n >> (layer + 1)
    x = out.reshape(*batch, m, 2, half)
    u, v = x[..., 0, :], x[..., 1, :]
    t = plan.psi_inv_br[m : 2 * m][:, None]
    ts = plan.psi_inv_br_shoup[m : 2 * m][:, None]
    s = add_mod32(u, v, q)
    d = mul_shoup32(sub_mod32(u, v, q), t, ts, q)
    return jnp.stack([s, d], axis=-2).reshape(*batch, n)


def _r4_inv(out, batch, n, q, plan, layer):
    """Two GS layers (layer+1 then layer) fused in one memory pass."""
    m = 1 << layer
    quarter = n >> (layer + 2)
    x = out.reshape(*batch, m, 4, quarter)
    x0, x1, x2, x3 = (x[..., i, :] for i in range(4))
    wi1 = plan.psi_inv_br[m : 2 * m][:, None]
    wi1s = plan.psi_inv_br_shoup[m : 2 * m][:, None]
    wi2 = plan.psi_inv_br[2 * m : 4 * m].reshape(m, 2)
    wi2s = plan.psi_inv_br_shoup[2 * m : 4 * m].reshape(m, 2)
    a0 = add_mod32(x0, x1, q)
    a1 = mul_shoup32(sub_mod32(x0, x1, q), wi2[:, 0:1], wi2s[:, 0:1], q)
    b0 = add_mod32(x2, x3, q)
    b1 = mul_shoup32(sub_mod32(x2, x3, q), wi2[:, 1:2], wi2s[:, 1:2], q)
    return jnp.stack(
        [
            add_mod32(a0, b0, q),
            add_mod32(a1, b1, q),
            mul_shoup32(sub_mod32(a0, b0, q), wi1, wi1s, q),
            mul_shoup32(sub_mod32(a1, b1, q), wi1, wi1s, q),
        ],
        axis=-2,
    ).reshape(*batch, n)


def _r8_inv(out, batch, n, q, plan, layer):
    """Three GS layers (layer+2, layer+1, layer) fused in one memory pass."""
    m = 1 << layer
    eighth = n >> (layer + 3)
    x = out.reshape(*batch, m, 8, eighth)
    xs = [x[..., i, :] for i in range(8)]
    wi1 = plan.psi_inv_br[m : 2 * m][:, None]
    wi1s = plan.psi_inv_br_shoup[m : 2 * m][:, None]
    wi2 = plan.psi_inv_br[2 * m : 4 * m].reshape(m, 2)
    wi2s = plan.psi_inv_br_shoup[2 * m : 4 * m].reshape(m, 2)
    wi3 = plan.psi_inv_br[4 * m : 8 * m].reshape(m, 4)
    wi3s = plan.psi_inv_br_shoup[4 * m : 8 * m].reshape(m, 4)

    g = []
    for i in range(4):
        g.append(add_mod32(xs[2 * i], xs[2 * i + 1], q))
        g.append(
            mul_shoup32(
                sub_mod32(xs[2 * i], xs[2 * i + 1], q),
                wi3[:, i : i + 1],
                wi3s[:, i : i + 1],
                q,
            )
        )
    h = [
        add_mod32(g[0], g[2], q),
        add_mod32(g[1], g[3], q),
        mul_shoup32(sub_mod32(g[0], g[2], q), wi2[:, 0:1], wi2s[:, 0:1], q),
        mul_shoup32(sub_mod32(g[1], g[3], q), wi2[:, 0:1], wi2s[:, 0:1], q),
        add_mod32(g[4], g[6], q),
        add_mod32(g[5], g[7], q),
        mul_shoup32(sub_mod32(g[4], g[6], q), wi2[:, 1:2], wi2s[:, 1:2], q),
        mul_shoup32(sub_mod32(g[5], g[7], q), wi2[:, 1:2], wi2s[:, 1:2], q),
    ]
    outs = [add_mod32(h[i], h[i + 4], q) for i in range(4)] + [
        mul_shoup32(sub_mod32(h[i], h[i + 4], q), wi1, wi1s, q) for i in range(4)
    ]
    return jnp.stack(outs, axis=-2).reshape(*batch, n)


def intt32(a: jnp.ndarray, plan: Ntt32Plan) -> jnp.ndarray:
    """Inverse negacyclic NTT over the last axis (bit-reversed -> normal)."""
    n, q = plan.n, plan.q
    if n == 1:
        return u32(a)
    batch = a.shape[:-1]
    out = u32(a)
    # reverse of the forward schedule: same groups, processed top-down
    sched = _fwd_schedule(plan.log_n)
    offsets = []
    layer = 0
    for width in sched:
        offsets.append((layer, width))
        layer += width
    for base, width in reversed(offsets):
        if width == 3:
            out = _r8_inv(out, batch, n, q, plan, base)
        elif width == 2:
            out = _r4_inv(out, batch, n, q, plan, base)
        else:
            out = _r2_inv(out, batch, n, q, plan, base)
    return mul_shoup32(
        out, np.uint32(plan.n_inv), np.uint32(plan.n_inv_shoup), q
    )


def pointwise_mul32(a: jnp.ndarray, b: jnp.ndarray, plan: Ntt32Plan) -> jnp.ndarray:
    """Evaluation-basis pointwise product (general Montgomery path)."""
    return mul_mod32(a, b, plan.zq)


def negacyclic_mul32(a: jnp.ndarray, b: jnp.ndarray, plan: Ntt32Plan) -> jnp.ndarray:
    """Full coefficient-basis negacyclic product: NTT -> pointwise -> INTT."""
    return intt32(pointwise_mul32(ntt32(a, plan), ntt32(b, plan), plan), plan)
