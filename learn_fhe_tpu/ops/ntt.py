"""Batched negacyclic NTT over Z_q[X]/(X^N+1).

Merged-twist DIT/DIF form (Algorithms 1-2 of eprint 2016/504, as used by the
reference `util/src/ring/fft.rs:40-77` + `util/src/ring/fft/zq.rs`): the
forward transform takes normal-order input to bit-reversed order; the inverse
takes bit-reversed back to normal order; pointwise products in between never
observe the ordering.

TPU-first design decisions:
- The transform is expressed as log N *vectorized stages* over a trailing
  coefficient axis; any number of leading batch axes (ciphertext batch, RNS
  limb, gadget digit) ride along for free and XLA fuses the butterfly chain.
- All twiddle multiplies use Shoup pairs (twiddles are constants), so a
  butterfly costs one mulhi64 + two wrapping muls on u32 limb lanes.
- Twiddle stacks are pure host-precomputed arrays (no global caches); a
  plan is just a frozen bundle of constants captured by jit.

Twiddle values match the reference's tables: psi_br[k] = psi_{2N}^{bitrev(k)}
with psi_{2N} = generator(q)^((q-1)/2N), identical to indexing the
bit-reversed full two-adic table at [m..2m] per stage (`fft/zq.rs:58-67`).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import lru_cache

import jax.numpy as jnp
import numpy as np

from ..utils.primes import mod_inverse, two_adic_generator
from .modular import ZqParams, mul_mod, mul_shoup, shoup_precompute, sub_mod, u64


def bit_reverse_indices(n: int) -> np.ndarray:
    """Permutation j -> bitrev_{log n}(j)."""
    log_n = n.bit_length() - 1
    idx = np.arange(n)
    rev = np.zeros(n, dtype=np.int64)
    for b in range(log_n):
        rev |= ((idx >> b) & 1) << (log_n - 1 - b)
    return rev


@dataclass(frozen=True, eq=False)
class NttPlan:
    """Pure precomputed twiddle stacks for one (q, n)."""

    q: int
    n: int
    log_n: int
    zq: ZqParams
    psi_br: np.ndarray  # (n,) u64: psi_{2n}^{bitrev(k)}
    psi_br_shoup: np.ndarray
    psi_inv_br: np.ndarray  # elementwise inverse of psi_br
    psi_inv_br_shoup: np.ndarray
    n_inv: int
    n_inv_shoup: int


@lru_cache(maxsize=None)
def ntt_plan(q: int, n: int) -> NttPlan:
    assert n & (n - 1) == 0
    log_n = n.bit_length() - 1
    assert (q - 1) % (2 * n) == 0, f"q={q} is not NTT-friendly for n={n}"
    psi = two_adic_generator(q, log_n + 1)  # order 2n
    rev = bit_reverse_indices(n)
    pow_list = []
    acc = 1
    for _ in range(n):
        pow_list.append(acc)
        acc = acc * psi % q
    inv_list = [mod_inverse(p, q) for p in pow_list]
    # table[k] = psi^k, then bit-reverse, matching `fft/zq.rs:58-67`
    psi_br = np.array(pow_list, dtype=np.uint64)[rev]
    psi_inv_br = np.array(inv_list, dtype=np.uint64)[rev]
    n_inv = mod_inverse(n % q, q)
    return NttPlan(
        q=q,
        n=n,
        log_n=log_n,
        zq=ZqParams(q),
        psi_br=psi_br,
        psi_br_shoup=shoup_precompute(psi_br, q),
        psi_inv_br=psi_inv_br,
        psi_inv_br_shoup=shoup_precompute(psi_inv_br, q),
        n_inv=n_inv,
        n_inv_shoup=int(shoup_precompute(n_inv, q)),
    )


def _r2_fwd(out, batch, n, q, plan, layer):
    m = 1 << layer
    half = n >> (layer + 1)
    x = out.reshape(*batch, m, 2, half)
    u, v = x[..., 0, :], x[..., 1, :]
    t = plan.psi_br[m : 2 * m][:, None]
    ts = plan.psi_br_shoup[m : 2 * m][:, None]
    tv = mul_shoup(v, t, ts, q)
    return jnp.stack(
        [_add_mod(u, tv, q), _sub_mod_c(u, tv, q)], axis=-2
    ).reshape(*batch, n)


def _r4_fwd(out, batch, n, q, plan, layer):
    """Two DIT layers fused in one memory pass (the pipelines are HBM-bound;
    see ops/ntt32.py for the measured schedule choice)."""
    m = 1 << layer
    quarter = n >> (layer + 2)
    x = out.reshape(*batch, m, 4, quarter)
    x0, x1, x2, x3 = (x[..., i, :] for i in range(4))
    w1 = plan.psi_br[m : 2 * m][:, None]
    w1s = plan.psi_br_shoup[m : 2 * m][:, None]
    w2 = plan.psi_br[2 * m : 4 * m].reshape(m, 2)
    w2s = plan.psi_br_shoup[2 * m : 4 * m].reshape(m, 2)
    t2 = mul_shoup(x2, w1, w1s, q)
    t3 = mul_shoup(x3, w1, w1s, q)
    a0 = _add_mod(x0, t2, q)
    a1 = _add_mod(x1, t3, q)
    b0 = _sub_mod_c(x0, t2, q)
    b1 = _sub_mod_c(x1, t3, q)
    u1 = mul_shoup(a1, w2[:, 0:1], w2s[:, 0:1], q)
    u3 = mul_shoup(b1, w2[:, 1:2], w2s[:, 1:2], q)
    return jnp.stack(
        [
            _add_mod(a0, u1, q),
            _sub_mod_c(a0, u1, q),
            _add_mod(b0, u3, q),
            _sub_mod_c(b0, u3, q),
        ],
        axis=-2,
    ).reshape(*batch, n)


def ntt(a: jnp.ndarray, plan: NttPlan) -> jnp.ndarray:
    """Forward negacyclic NTT over the last axis: normal -> bit-reversed order;
    radix-4 fused passes (ops/ntt32.py documents the measurement)."""
    n, q = plan.n, plan.q
    if n == 1:
        return u64(a)
    batch = a.shape[:-1]
    out = u64(a)
    layer = 0
    if plan.log_n % 2:
        out = _r2_fwd(out, batch, n, q, plan, 0)
        layer = 1
    while layer < plan.log_n:
        out = _r4_fwd(out, batch, n, q, plan, layer)
        layer += 2
    return out


def _r2_inv(out, batch, n, q, plan, layer):
    m = 1 << layer
    half = n >> (layer + 1)
    x = out.reshape(*batch, m, 2, half)
    u, v = x[..., 0, :], x[..., 1, :]
    t = plan.psi_inv_br[m : 2 * m][:, None]
    ts = plan.psi_inv_br_shoup[m : 2 * m][:, None]
    s = _add_mod(u, v, q)
    d = mul_shoup(_sub_mod_c(u, v, q), t, ts, q)
    return jnp.stack([s, d], axis=-2).reshape(*batch, n)


def _r4_inv(out, batch, n, q, plan, layer):
    m = 1 << layer
    quarter = n >> (layer + 2)
    x = out.reshape(*batch, m, 4, quarter)
    x0, x1, x2, x3 = (x[..., i, :] for i in range(4))
    wi1 = plan.psi_inv_br[m : 2 * m][:, None]
    wi1s = plan.psi_inv_br_shoup[m : 2 * m][:, None]
    wi2 = plan.psi_inv_br[2 * m : 4 * m].reshape(m, 2)
    wi2s = plan.psi_inv_br_shoup[2 * m : 4 * m].reshape(m, 2)
    a0 = _add_mod(x0, x1, q)
    a1 = mul_shoup(_sub_mod_c(x0, x1, q), wi2[:, 0:1], wi2s[:, 0:1], q)
    b0 = _add_mod(x2, x3, q)
    b1 = mul_shoup(_sub_mod_c(x2, x3, q), wi2[:, 1:2], wi2s[:, 1:2], q)
    return jnp.stack(
        [
            _add_mod(a0, b0, q),
            _add_mod(a1, b1, q),
            mul_shoup(_sub_mod_c(a0, b0, q), wi1, wi1s, q),
            mul_shoup(_sub_mod_c(a1, b1, q), wi1, wi1s, q),
        ],
        axis=-2,
    ).reshape(*batch, n)


def intt(a: jnp.ndarray, plan: NttPlan) -> jnp.ndarray:
    """Inverse negacyclic NTT over the last axis: bit-reversed -> normal order."""
    n, q = plan.n, plan.q
    if n == 1:
        return u64(a)
    batch = a.shape[:-1]
    out = u64(a)
    layer = plan.log_n - 2
    while layer >= (1 if plan.log_n % 2 else 0):
        out = _r4_inv(out, batch, n, q, plan, layer)
        layer -= 2
    if plan.log_n % 2:
        out = _r2_inv(out, batch, n, q, plan, 0)
    return mul_shoup(out, u64(plan.n_inv), u64(plan.n_inv_shoup), q)


@lru_cache(maxsize=None)
def eval_exponents(n: int) -> np.ndarray:
    """Root exponent per forward-NTT output slot: out[j] = a(psi^{e[j]}).

    Computed empirically by running a host numpy mirror of the merged-twist
    DIT stages on the polynomial a(X) = X over a small NTT-friendly prime and
    matching slot values against the psi power table — the slot->root map is
    determined by the butterfly index structure alone, so it is identical for
    every prime and for the u32/u64 engines. Feeds the evaluation-basis
    automorphism permutation (hoisted rotations, models/ckks/hoisting.py)."""
    if n == 1:
        return np.zeros(1, dtype=np.int64)
    log_n = n.bit_length() - 1
    from ..utils.primes import two_adic_primes

    q = next(two_adic_primes(31, log_n + 1))
    psi = two_adic_generator(q, log_n + 1)
    rev = bit_reverse_indices(n)
    pow_list = []
    acc = 1
    for _ in range(2 * n):
        pow_list.append(acc)
        acc = acc * psi % q
    psi_br = np.array(pow_list[:n], dtype=object)[rev]
    out = np.zeros(n, dtype=object)
    out[1] = 1  # a(X) = X
    for layer in range(log_n):
        m = 1 << layer
        half = n >> (layer + 1)
        x = out.reshape(m, 2, half)
        u, v = x[:, 0, :], x[:, 1, :]
        tv = (v * psi_br[m : 2 * m, None]) % q
        out = np.stack([(u + tv) % q, (u - tv) % q], axis=1).reshape(n)
    pos_of_value = {v: k for k, v in enumerate(pow_list)}
    e = np.array([pos_of_value[int(v)] for v in out], dtype=np.int64)
    assert (e % 2 == 1).all() and len(set(e.tolist())) == n
    return e


@lru_cache(maxsize=None)
def eval_automorphism_perm(n: int, t: int) -> np.ndarray:
    """Permutation sigma with NTT(automorphism_t(x)) == NTT(x)[sigma]:
    slot j of the transformed automorphism holds a(root^t), i.e. the slot
    whose exponent is e[j]*t mod 2n. No sign corrections — the evaluation
    points are closed under odd exponentiation."""
    assert t % 2 == 1
    e = eval_exponents(n)
    pos = {int(exp): j for j, exp in enumerate(e)}
    return np.array([pos[int(exp) * t % (2 * n)] for exp in e], dtype=np.int64)


def pointwise_mul(a: jnp.ndarray, b: jnp.ndarray, plan: NttPlan) -> jnp.ndarray:
    """Pointwise product in evaluation basis (general Montgomery path)."""
    return mul_mod(a, b, plan.zq)


def negacyclic_mul(a: jnp.ndarray, b: jnp.ndarray, plan: NttPlan) -> jnp.ndarray:
    """Full coefficient-basis negacyclic product: NTT -> pointwise -> INTT."""
    return intt(pointwise_mul(ntt(a, plan), ntt(b, plan), plan), plan)


def _add_mod(a, b, q):
    s = a + b
    qq = u64(q)
    return jnp.where(s >= qq, s - qq, s)


def _sub_mod_c(a, b, q):
    return sub_mod(a, b, q)
