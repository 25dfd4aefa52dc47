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

import os
from dataclasses import dataclass
from functools import lru_cache

import jax.numpy as jnp
import numpy as np
from jax import lax

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
class Fourstep32:
    """Host precomputes for the four-step (matmul) formulation at one (q, n).

    The size-n transform factors as x.reshape(n1, n2) -> (n1 x n1 modular
    matmul) -> elementwise twiddle -> (n2 x n2 modular matmul), with the
    bit-reversed output order of `ntt32` folded into the matrices so the two
    paths interoperate freely. Each matmul runs on the MXU as 16 int8-limb
    einsums (balanced base-256 digits, i32 accumulation, Shoup
    recombination); XLA fuses the limb extract/combine into the dot
    producers/consumers. Exact for q < 2^31.
    """

    n1: int
    n2: int
    V1_l: tuple  # 4 x (n1, n1) int8 limb planes of the left matrix
    W2_l: tuple  # 4 x (n2, n2) of the right matrix
    V1i_l: tuple  # inverses (carry the 1/n normalization)
    W2i_l: tuple
    T: np.ndarray  # (n1, n2) u32 middle twiddle
    T_s: np.ndarray
    Ti: np.ndarray
    Ti_s: np.ndarray
    P: tuple  # 2^{8s} mod q for limb-sum recombination, s = 0..6
    P_s: tuple
    K: tuple  # (2^32 * 2^{8s}) mod q: correction for negative i32 sums


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
    fourstep: Fourstep32 | None = None


def _host_limbs_i8(M: np.ndarray, q: int) -> tuple:
    """Split a mod-q matrix into 4 balanced base-256 int8 limb planes."""
    t = M.astype(np.int64)
    t = np.where(t > q // 2, t - q, t)
    limbs = []
    for _ in range(4):
        d = ((t + 128) & 255) - 128
        limbs.append(d.astype(np.int8))
        t = (t - d) >> 8
    assert (t == 0).all()
    return tuple(limbs)


def _inv_mod_matrix(M: np.ndarray, q: int) -> np.ndarray:
    """Inverse of M mod q by Gauss-Jordan over Z_q (exact Python ints)."""
    n = M.shape[0]
    A = [
        [int(M[i, j]) for j in range(n)] + [int(i == j) for j in range(n)]
        for i in range(n)
    ]
    for col in range(n):
        piv = next(r for r in range(col, n) if A[r][col] % q)
        A[col], A[piv] = A[piv], A[col]
        inv = mod_inverse(A[col][col] % q, q)
        A[col] = [v * inv % q for v in A[col]]
        for r in range(n):
            if r != col and A[r][col] % q:
                f = A[r][col] % q
                A[r] = [(a - f * b) % q for a, b in zip(A[r], A[col])]
    return np.array([[A[i][n + j] for j in range(n)] for i in range(n)], dtype=np.uint64)


def _bitrev_int(x: int, bits: int) -> int:
    r = 0
    for t in range(bits):
        r |= ((x >> t) & 1) << (bits - 1 - t)
    return r


def _fourstep_build(q: int, n: int, n1: int) -> Fourstep32:
    """Four-step matrices with ntt32's bit-reversed output order folded in.

    ntt32 computes X[k] = sum_i x[i] psi^((2*rev(k)+1) i) (negacyclic DIT,
    bit-reversed output). With i = i1*n2 + i2, k = k1*n2 + k2 the mixed-radix
    reversal is rev(k) = rev_l2(k2)*n1 + rev_l1(k1), and since psi has order
    2n the k2-dependence of the left factor vanishes:
      X[k1,k2] = sum_i2 [ (sum_i1 V1[k1,i1] x[i1,i2]) * T[k1,i2] ] W2[i2,k2]
    """
    n2 = n // n1
    log1, log2 = n1.bit_length() - 1, n2.bit_length() - 1
    psi = two_adic_generator(q, n.bit_length())  # order 2n
    w = pow(psi, 2, q)  # order n
    V1 = np.zeros((n1, n1), dtype=np.uint64)
    T = np.zeros((n1, n2), dtype=np.uint64)
    W2 = np.zeros((n2, n2), dtype=np.uint64)
    for k1 in range(n1):
        kk = _bitrev_int(k1, log1)
        for i1 in range(n1):
            V1[k1, i1] = pow(psi, (n2 * (2 * kk + 1) * i1) % (2 * n), q)
        for i2 in range(n2):
            T[k1, i2] = pow(psi, ((2 * kk + 1) * i2) % (2 * n), q)
    for i2 in range(n2):
        for k2 in range(n2):
            W2[i2, k2] = pow(w, (n1 * i2 * _bitrev_int(k2, log2)) % n, q)

    V1i = _inv_mod_matrix(V1, q)
    W2i = _inv_mod_matrix(W2, q)
    Ti = np.vectorize(lambda v: mod_inverse(int(v), q))(T).astype(np.uint64)
    Tu = T.astype(np.uint32)
    Tiu = Ti.astype(np.uint32)
    return Fourstep32(
        n1=n1,
        n2=n2,
        V1_l=_host_limbs_i8(V1, q),
        W2_l=_host_limbs_i8(W2, q),
        V1i_l=_host_limbs_i8(V1i, q),
        W2i_l=_host_limbs_i8(W2i, q),
        T=Tu,
        T_s=shoup32(Tu, q),
        Ti=Tiu,
        Ti_s=shoup32(Tiu, q),
        P=tuple(np.uint32((1 << (8 * s)) % q) for s in range(7)),
        P_s=tuple(np.uint32(int(shoup32((1 << (8 * s)) % q, q)[()])) for s in range(7)),
        K=tuple(np.uint32(((1 << 32) * ((1 << (8 * s)) % q)) % q) for s in range(7)),
    )


@lru_cache(maxsize=None)
def ntt32_plan(q: int, n: int, fourstep: bool = False, n1: int | None = None) -> Ntt32Plan:
    # Experiment knob: FHE_TPU_NTT32_FOURSTEP=<min_log_n> flips every plan
    # with log_n >= min_log_n onto the four-step MXU path, so full pipelines
    # (TFHE torus-CRT at N=2^11, FHEW at N=2^9..11) can be A/B'd on chip
    # without touching call sites. Read at plan-build time; plans are
    # lru-cached, so set it before the first param construction.
    if not fourstep:
        env = os.environ.get("FHE_TPU_NTT32_FOURSTEP")
        if env is not None and n.bit_length() - 1 >= int(env):
            fourstep = True
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
    fs = None
    if fourstep:
        fs = _fourstep_build(q, n, n1 or (1 << ((log_n + 1) // 2)))
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
        fourstep=fs,
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


def _rk_fwd(out, batch, n, q, plan, layer, width):
    """Generic fused DIT pass: `width` butterfly layers in ONE memory sweep
    over 2^width interleaved slices (the pipeline is HBM-bound, ARCHITECTURE
    §5/§6 — pass count, not multiply count, prices the transform). width=3
    reproduces the hand-written radix-8 pass element-for-element; widths 4/5
    extend the same recursion (w*2^(w-1) muls per 2^w outputs = the radix-2
    multiply count at 1/w the traffic)."""
    m = 1 << layer
    R = 1 << width
    rest = n >> (layer + width)
    x = out.reshape(*batch, m, R, rest)
    xs = [x[..., i, :] for i in range(R)]
    for t in range(width):
        w = plan.psi_br[(m << t) : (m << (t + 1))].reshape(m, 1 << t)
        ws = plan.psi_br_shoup[(m << t) : (m << (t + 1))].reshape(m, 1 << t)
        blk = R >> t
        half = blk >> 1
        new = [None] * R
        for g in range(1 << t):
            base = g * blk
            wg = w[:, g : g + 1]
            wgs = ws[:, g : g + 1]
            for i in range(half):
                u, v = xs[base + i], xs[base + half + i]
                tv = mul_shoup32(v, wg, wgs, q)
                new[base + i] = add_mod32(u, tv, q)
                new[base + half + i] = sub_mod32(u, tv, q)
        xs = new
    if _BARRIER:
        xs = list(lax.optimization_barrier(tuple(xs)))
    return _recombine(xs, batch, n)


def _i_twiddle(w: np.ndarray, m: int, t: int, width: int) -> np.ndarray:
    """(m * 2^t,) twiddle run -> broadcastable (m, 2..2[t], 1..1[width-t], 1)."""
    return w.reshape(m, *([2] * t), *([1] * (width - t)), 1)


def _rk_fwd_i(out, batch, n, q, plan, layer, width):
    """Interleaved fused DIT pass — same math as `_rk_fwd`, different data
    movement. `_rk_fwd` splits the 2^width axis into python slices and
    recombines with jnp.stack; XLA lowers that stack to a dynamic-update-
    slice chain whose every piece-fusion re-reads the FULL input (profiled
    inside the TFHE blind-rotation scan: 255k DUS ops, 38% of device
    compute — ARCHITECTURE §19). Here each butterfly layer is a
    whole-tensor flip/select expression along one axis of a (2,)*width
    view, so the entire pass stays a single elementwise fusion: one read,
    one write, no concatenate. Costs ~2x redundant ALU (both select arms
    evaluate everywhere) — free when the pass is bandwidth-bound."""
    m = 1 << layer
    rest = n >> (layer + width)
    x = out.reshape(*batch, m, *([2] * width), rest)
    nb = len(batch)
    for t in range(width):
        ax = nb + 1 + t  # butterfly axis a_t (a_0 = MSB of the 2^width group)
        wg = jnp.asarray(_i_twiddle(plan.psi_br[(m << t) : (m << (t + 1))], m, t, width))
        wgs = jnp.asarray(
            _i_twiddle(plan.psi_br_shoup[(m << t) : (m << (t + 1))], m, t, width)
        )
        r = jnp.flip(x, axis=ax)
        shape = [1] * x.ndim
        shape[ax] = 2
        mask0 = jnp.arange(2, dtype=jnp.uint32).reshape(shape) == 0
        u = jnp.where(mask0, x, r)  # my pair's upper element
        v = jnp.where(mask0, r, x)  # my pair's lower element
        tv = mul_shoup32(v, wg, wgs, q)
        x = jnp.where(mask0, add_mod32(u, tv, q), sub_mod32(u, tv, q))
    return x.reshape(*batch, n)


def _rk_inv_i(out, batch, n, q, plan, layer, width):
    """Interleaved fused GS (inverse) pass: mirror of `_rk_fwd_i`."""
    m = 1 << layer
    rest = n >> (layer + width)
    x = out.reshape(*batch, m, *([2] * width), rest)
    nb = len(batch)
    for t in reversed(range(width)):
        ax = nb + 1 + t
        wg = jnp.asarray(
            _i_twiddle(plan.psi_inv_br[(m << t) : (m << (t + 1))], m, t, width)
        )
        wgs = jnp.asarray(
            _i_twiddle(plan.psi_inv_br_shoup[(m << t) : (m << (t + 1))], m, t, width)
        )
        r = jnp.flip(x, axis=ax)
        shape = [1] * x.ndim
        shape[ax] = 2
        mask0 = jnp.arange(2, dtype=jnp.uint32).reshape(shape) == 0
        u = jnp.where(mask0, x, r)
        v = jnp.where(mask0, r, x)
        s = add_mod32(u, v, q)
        d = mul_shoup32(sub_mod32(u, v, q), wg, wgs, q)
        x = jnp.where(mask0, s, d)
    return x.reshape(*batch, n)


def _recombine(xs, batch, n):
    """Final recombine of the R butterfly slices. Default: jnp.stack (lowered
    by XLA to a DUS chain, ARCHITECTURE §19). FHE_TPU_NTT32_CONCAT=1 emits an
    explicit lax-concatenate of the slices instead (VERDICT r04 item 7's
    first untested reformulation)."""
    if _CONCAT:
        return jnp.concatenate([p[..., None, :] for p in xs], axis=-2).reshape(
            *batch, n
        )
    return jnp.stack(xs, axis=-2).reshape(*batch, n)


def _rk_fwd_p(out, batch, n, q, plan, layer, width):
    """Pair-stack fused DIT pass (FHE_TPU_NTT32_PAIRSTACK): same math as
    `_rk_fwd`, but the butterflies stay in ONE array — each sub-layer views
    the R axis as (2^t, 2, half) and recombines with a single 2-wide
    jnp.stack, instead of slicing into R pieces and stacking all R at the
    end. Targets the §19 DUS read amplification by giving XLA stacks of 2
    (one concat of equal halves) per sub-layer rather than one R-piece DUS
    chain per pass; the cost is that sub-layers may materialize (width
    memory sweeps instead of one)."""
    m = 1 << layer
    R = 1 << width
    rest = n >> (layer + width)
    x = out.reshape(*batch, m, R, rest)
    for t in range(width):
        g = 1 << t
        half = R >> (t + 1)
        w = plan.psi_br[(m << t) : (m << (t + 1))].reshape(m, g, 1, 1)
        ws = plan.psi_br_shoup[(m << t) : (m << (t + 1))].reshape(m, g, 1, 1)
        xv = x.reshape(*batch, m, g, 2, half, rest)
        u = xv[..., 0, :, :]
        v = xv[..., 1, :, :]
        tv = mul_shoup32(v, w, ws, q)
        x = jnp.stack(
            [add_mod32(u, tv, q), sub_mod32(u, tv, q)], axis=-3
        ).reshape(*batch, m, R, rest)
    return x.reshape(*batch, n)


def _rk_inv_p(out, batch, n, q, plan, layer, width):
    """Pair-stack fused GS (inverse) pass: mirror of `_rk_fwd_p`."""
    m = 1 << layer
    R = 1 << width
    rest = n >> (layer + width)
    x = out.reshape(*batch, m, R, rest)
    for t in reversed(range(width)):
        g = 1 << t
        half = R >> (t + 1)
        wi = plan.psi_inv_br[(m << t) : (m << (t + 1))].reshape(m, g, 1, 1)
        wis = plan.psi_inv_br_shoup[(m << t) : (m << (t + 1))].reshape(m, g, 1, 1)
        xv = x.reshape(*batch, m, g, 2, half, rest)
        u = xv[..., 0, :, :]
        v = xv[..., 1, :, :]
        x = jnp.stack(
            [
                add_mod32(u, v, q),
                mul_shoup32(sub_mod32(u, v, q), wi, wis, q),
            ],
            axis=-3,
        ).reshape(*batch, m, R, rest)
    return x.reshape(*batch, n)


def _rk_inv(out, batch, n, q, plan, layer, width):
    """Generic fused GS (inverse) pass: exact mirror of `_rk_fwd` (layers
    processed top-down), element-identical to the hand radix-4/8 passes."""
    m = 1 << layer
    R = 1 << width
    rest = n >> (layer + width)
    x = out.reshape(*batch, m, R, rest)
    xs = [x[..., i, :] for i in range(R)]
    for t in reversed(range(width)):
        wi = plan.psi_inv_br[(m << t) : (m << (t + 1))].reshape(m, 1 << t)
        wis = plan.psi_inv_br_shoup[(m << t) : (m << (t + 1))].reshape(m, 1 << t)
        blk = R >> t
        half = blk >> 1
        new = [None] * R
        for g in range(1 << t):
            base = g * blk
            wg = wi[:, g : g + 1]
            wgs = wis[:, g : g + 1]
            for i in range(half):
                u, v = xs[base + i], xs[base + half + i]
                new[base + i] = add_mod32(u, v, q)
                new[base + half + i] = mul_shoup32(sub_mod32(u, v, q), wg, wgs, q)
        xs = new
    if _BARRIER:
        xs = list(lax.optimization_barrier(tuple(xs)))
    return _recombine(xs, batch, n)


def _fs_limbs_dev(x: jnp.ndarray, q: int) -> list:
    """u32 in [0, q) -> centered -> 4 balanced base-256 int8 limb planes."""
    t = x.astype(jnp.int32)
    t = jnp.where(t > q // 2, t - np.int32(q), t)
    outs = []
    for _ in range(4):
        d = ((t + 128) & 255) - 128
        outs.append(d.astype(jnp.int8))
        t = (t - d) >> 8
    return outs


def _fs_combine(buckets, fs: Fourstep32, q: int) -> jnp.ndarray:
    """Recombine 7 i32 limb-weight bucket sums into a reduced u32 value."""
    acc = None
    for s in range(7):
        a = buckets[s].astype(jnp.uint32)
        neg = (buckets[s] < 0).astype(jnp.uint32)
        r = mul_shoup32(a, fs.P[s], fs.P_s[s], q)
        r = r - neg * fs.K[s]
        r = jnp.minimum(r, r + np.uint32(q))
        acc = r if acc is None else acc + r
        acc = jnp.minimum(acc, acc - np.uint32(q))
    return acc


def _fs_mm_left(M_l, x, fs: Fourstep32, q: int) -> jnp.ndarray:
    """mod-q matmul over axis -2: out[.., k, n] = sum_i M[k, i] x[.., i, n]."""
    Xl = _fs_limbs_dev(x, q)
    buckets = [None] * 7
    for i in range(4):
        for j in range(4):
            p = jnp.einsum(
                "ki,...in->...kn",
                jnp.asarray(M_l[j]),
                Xl[i],
                preferred_element_type=jnp.int32,
            )
            s = i + j
            buckets[s] = p if buckets[s] is None else buckets[s] + p
    return _fs_combine(buckets, fs, q)


def _fs_mm_right(x, M_l, fs: Fourstep32, q: int) -> jnp.ndarray:
    """mod-q matmul over axis -1: out[.., k, n] = sum_i x[.., k, i] M[i, n]."""
    Xl = _fs_limbs_dev(x, q)
    buckets = [None] * 7
    for i in range(4):
        for j in range(4):
            p = jnp.einsum(
                "...ki,in->...kn",
                Xl[i],
                jnp.asarray(M_l[j]),
                preferred_element_type=jnp.int32,
            )
            s = i + j
            buckets[s] = p if buckets[s] is None else buckets[s] + p
    return _fs_combine(buckets, fs, q)


def _fs_fwd(a: jnp.ndarray, plan: Ntt32Plan) -> jnp.ndarray:
    """(.., n) u32 -> (.., n) u32 in ntt32's bit-reversed output order."""
    fs, q = plan.fourstep, plan.q
    M = a.reshape(*a.shape[:-1], fs.n1, fs.n2)
    y = _fs_mm_left(fs.V1_l, M, fs, q)
    y = mul_shoup32(y, jnp.asarray(fs.T), jnp.asarray(fs.T_s), q)
    z = _fs_mm_right(y, fs.W2_l, fs, q)
    return z.reshape(*a.shape[:-1], plan.n)


def _fs_inv(a: jnp.ndarray, plan: Ntt32Plan) -> jnp.ndarray:
    """Exact inverse of _fs_fwd; the matrix inverses already carry the 1/n
    normalization, so no extra n_inv factor is applied."""
    fs, q = plan.fourstep, plan.q
    M = a.reshape(*a.shape[:-1], fs.n1, fs.n2)
    y = _fs_mm_right(M, fs.W2i_l, fs, q)
    y = mul_shoup32(y, jnp.asarray(fs.Ti), jnp.asarray(fs.Ti_s), q)
    x = _fs_mm_left(fs.V1i_l, y, fs, q)
    return x.reshape(*a.shape[:-1], plan.n)


# Widest fused pass, ring-gated (measured on v5e under the §17 sync
# harness, 2026-08-19, /tmp/r3logs): at N=2^14 radix-8 passes (5 memory
# sweeps instead of 7) lift the polymul from 166.6k/s to 183.6k/s (+10%);
# at the TFHE torus-CRT ring N=2^11 radix-8 reads 288 PBS/s vs the 275.6
# radix-4 record. Below log_n=11 the traffic win shrinks (the array is
# small enough that pass overheads, not bytes, dominate) and the old
# radix-8 reading at the FHEW ring was neutral-to-worse, so radix-4 stays.
# FHE_TPU_NTT32_PASS_WIDTH overrides the gate for on-chip A/Bs (read at
# import; every schedule is bit-exact — pinned by tests/test_ntt32_radix8).
_env_pw = os.environ.get("FHE_TPU_NTT32_PASS_WIDTH")
_PASS_WIDTH: int | None = int(_env_pw) if _env_pw is not None else None
if _PASS_WIDTH not in (None, 1, 2, 3, 4, 5):
    # A bare assert is stripped under `python -O`, and an invalid width
    # would fall through the width dispatch into the radix-2 branch while
    # `layer += width` skips layers — silently wrong transforms.
    raise ValueError(
        f"FHE_TPU_NTT32_PASS_WIDTH must be in 1..5 (got {_env_pw!r})"
    )


def _fwd_schedule(log_n: int) -> list[int]:
    """Radix schedule (layer-counts per pass): greedy widest-pass-first
    with the remainder covered by narrower ones."""
    width = _PASS_WIDTH if _PASS_WIDTH is not None else (3 if log_n >= 11 else 2)
    sched = []
    rem = log_n
    while rem >= width:
        sched.append(width)
        rem -= width
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
    if plan.fourstep is not None:
        return _fs_fwd(u32(a), plan)
    batch = a.shape[:-1]
    out = u32(a)
    for base, width in _schedule_offsets(plan.log_n):
        out = _FWD_PASS[width](out, batch, n, q, plan, base)
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
    if plan.fourstep is not None:
        return _fs_inv(u32(a), plan)
    batch = a.shape[:-1]
    out = u32(a)
    # reverse of the forward schedule: same groups, processed top-down
    for base, width in reversed(_schedule_offsets(plan.log_n)):
        out = _INV_PASS[width](out, batch, n, q, plan, base)
    return mul_shoup32(
        out, np.uint32(plan.n_inv), np.uint32(plan.n_inv_shoup), q
    )


def pointwise_mul32(a: jnp.ndarray, b: jnp.ndarray, plan: Ntt32Plan) -> jnp.ndarray:
    """Evaluation-basis pointwise product (general Montgomery path)."""
    return mul_mod32(a, b, plan.zq)


_FWD_PASS = {
    1: _r2_fwd,
    2: _r4_fwd,
    3: _r8_fwd,
    4: lambda *a: _rk_fwd(*a, 4),
    5: lambda *a: _rk_fwd(*a, 5),
}
_INV_PASS = {
    1: _r2_inv,
    2: _r4_inv,
    3: _r8_inv,
    4: lambda *a: _rk_inv(*a, 4),
    5: lambda *a: _rk_inv(*a, 5),
}

# Interleaved (flip/select) pass formulation — removes the jnp.stack ->
# dynamic-update-slice chain whose piece-fusions re-read the full input
# (ARCHITECTURE §19). Default OFF: measured on-chip 2026-08-20, it LOSES
# (u32 N=2^14 126.3k vs 183.6k polymuls/s; TFHE PBS 202 vs 287/s) — the
# per-element select tree multiplies VPU work ~2.7x, which outweighs the
# read amplification it removes. Kept probeable for future backends;
# bit-exactness pinned by tests/test_ntt32_radix8.
_INTERLEAVE = os.environ.get("FHE_TPU_NTT32_INTERLEAVE", "0") == "1"
if _INTERLEAVE:
    _FWD_PASS = {w: (lambda *a, _w=w: _rk_fwd_i(*a, _w)) for w in (1, 2, 3, 4, 5)}
    _INV_PASS = {w: (lambda *a, _w=w: _rk_inv_i(*a, _w)) for w in (1, 2, 3, 4, 5)}

# Barrier variant: keep the slice-computed butterflies but materialize them
# (`lax.optimization_barrier` inside `_rk_fwd`/`_rk_inv` forces one
# multi-output fusion) before the jnp.stack, so each stack piece reads its
# 1/2^width slice instead of re-deriving from the full input — targets the
# same DUS read amplification at no extra VPU work, costing one extra
# materialized array per pass. Routes the hand radix-2/4/8 widths through
# the element-identical generic passes so the barrier applies everywhere.
_BARRIER = os.environ.get("FHE_TPU_NTT32_BARRIER", "0") == "1"
if _BARRIER and _INTERLEAVE:
    # Precedence: the interleaved tables win and the barrier branch inside
    # `_rk_fwd`/`_rk_inv` never runs — a silent no-op that would corrupt an
    # A/B measurement (ADVICE r04). Refuse the combination outright.
    raise RuntimeError(
        "FHE_TPU_NTT32_BARRIER=1 and FHE_TPU_NTT32_INTERLEAVE=1 are mutually "
        "exclusive (the interleaved passes never reach the barrier branch); "
        "set exactly one"
    )
if _BARRIER:
    _FWD_PASS = {w: (lambda *a, _w=w: _rk_fwd(*a, _w)) for w in (1, 2, 3, 4, 5)}
    _INV_PASS = {w: (lambda *a, _w=w: _rk_inv(*a, _w)) for w in (1, 2, 3, 4, 5)}

# Pair-stack pass formulation (VERDICT r04 item 7, the second of the two
# reformulations not yet measured against the §19 DUS wall): one array
# throughout, a 2-wide stack per sub-layer instead of one R-piece stack per
# pass. Mutually exclusive with the other pass-table remaps.
_CONCAT = os.environ.get("FHE_TPU_NTT32_CONCAT", "0") == "1"
_PAIRSTACK = os.environ.get("FHE_TPU_NTT32_PAIRSTACK", "0") == "1"
if _CONCAT and not (_BARRIER or _INTERLEAVE or _PAIRSTACK):
    # concat only changes the recombine inside the generic passes; route the
    # hand radix widths through them so it applies everywhere
    _FWD_PASS = {w: (lambda *a, _w=w: _rk_fwd(*a, _w)) for w in (1, 2, 3, 4, 5)}
    _INV_PASS = {w: (lambda *a, _w=w: _rk_inv(*a, _w)) for w in (1, 2, 3, 4, 5)}
if _PAIRSTACK and (_BARRIER or _INTERLEAVE):
    raise RuntimeError(
        "FHE_TPU_NTT32_PAIRSTACK is mutually exclusive with "
        "FHE_TPU_NTT32_BARRIER/INTERLEAVE; set exactly one"
    )
if _PAIRSTACK:
    _FWD_PASS = {w: (lambda *a, _w=w: _rk_fwd_p(*a, _w)) for w in (1, 2, 3, 4, 5)}
    _INV_PASS = {w: (lambda *a, _w=w: _rk_inv_p(*a, _w)) for w in (1, 2, 3, 4, 5)}


# A/B toggle for the fused-pointwise polymul. Default OFF: on-chip A/B
# (2026-08-19, §17 sync harness, N=2^14 batch=256 chain=10) measured the
# manually-fused schedule at 162-177k polymuls/s vs 183.5k unfused — XLA
# already fuses the chained composition inside one jit region, and the
# manual interleaving only enlarges the live working set. Kept for probing
# (FHE_TPU_NTT32_FUSE=1); bit-exactness pinned by tests/test_ntt32_radix8.
_FUSE_PW = os.environ.get("FHE_TPU_NTT32_FUSE", "0") == "1"


def _schedule_offsets(log_n: int) -> list[tuple[int, int]]:
    offsets, layer = [], 0
    for width in _fwd_schedule(log_n):
        offsets.append((layer, width))
        layer += width
    return offsets


def negacyclic_mul32(a: jnp.ndarray, b: jnp.ndarray, plan: Ntt32Plan) -> jnp.ndarray:
    """Full coefficient-basis negacyclic product: NTT -> pointwise -> INTT,
    with the pointwise product FUSED into the last forward / first inverse
    pass (one jit region, so XLA emits them as a single HBM sweep: the
    NTT-domain operands and the pointwise result never round-trip to HBM).
    The last forward pass and the first inverse pass share geometry (the
    inverse replays the forward schedule reversed), so the fusion is a pure
    traffic reshaping — 30 n-sized touches instead of 36 at N=2^14 — and the
    result is element-identical to the unfused composition (pinned by
    tests/test_golden.py and the schedule A/B tests).

    Reference cost anchor: `util/src/ring/fft/zq.rs:14-19` runs the three
    transforms and the pointwise product as four separate array sweeps.
    """
    n, q = plan.n, plan.q
    if n == 1 or plan.fourstep is not None or _FUSE_PW is False:
        return intt32(pointwise_mul32(ntt32(a, plan), ntt32(b, plan), plan), plan)
    batch = a.shape[:-1]
    offsets = _schedule_offsets(plan.log_n)
    ea, eb = u32(a), u32(b)
    for base, width in offsets[:-1]:
        ea = _FWD_PASS[width](ea, batch, n, q, plan, base)
        eb = _FWD_PASS[width](eb, batch, n, q, plan, base)
    # fused middle: finish both forwards, multiply, start the inverse
    base, width = offsets[-1]
    ea = _FWD_PASS[width](ea, batch, n, q, plan, base)
    eb = _FWD_PASS[width](eb, batch, n, q, plan, base)
    out = pointwise_mul32(ea, eb, plan)
    out = _INV_PASS[width](out, batch, n, q, plan, base)
    for base, width in reversed(offsets[:-1]):
        out = _INV_PASS[width](out, batch, n, q, plan, base)
    return mul_shoup32(out, np.uint32(plan.n_inv), np.uint32(plan.n_inv_shoup), q)
