"""Coefficient-axis (N) sharded negacyclic NTT over a device mesh.

SURVEY.md §2.5's polynomial-coefficient parallel axis; the serial stage
structure being split is the reference's butterfly loops
(`util/src/ring/fft.rs:40-77`). BASELINE.json's north star names "NTT
butterfly stages exchanged all-to-all over ICI" — this is that subsystem.

Design: the coefficient axis is sharded CONTIGUOUSLY over D devices, and the
full-size merged-twist DIT transform (ops/rns.py fwd_stages) is split in
place:

- Layers 0..log2(D)-1 pair element j with j + N/2^(l+1) — always on a
  partner device (device XOR D>>(l+1)), at the same local offset, and the
  twiddle psi_br[2^l + block] is a PER-DEVICE SCALAR (the block index is the
  top l bits of the device index). Each such layer is ONE ppermute of the
  local block over ICI plus local butterfly math — no all-gather, no
  transpose, traffic = local bytes per layer.
- Layers log2(D).. are entirely device-local: at layer log2(D) the DIT block
  size equals the shard size, so each device runs the tail of the transform
  on its own block using a compact per-device twiddle table T[d] with the
  SAME layout a plain plan table has (T[d][k] = psi_br[(D+d)*msb(k) +
  k-msb(k)]), gathered by lax.axis_index inside shard_map.

Because these are the SAME butterflies in the same order as the unsharded
transform, every intermediate value is bit-identical to the single-device
path — sharded forward/pointwise/inverse compose with unsharded results
exactly (asserted in tests/test_parallel.py).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

try:  # jax >= 0.4.35 exports shard_map at top level
    from jax import shard_map
except ImportError:  # pragma: no cover - older jax
    from jax.experimental.shard_map import shard_map

from ..ops.rns import (
    add_mod_v,
    fwd_stages,
    inv_stages,
    mul_mod_v,
    mul_shoup_v,
    rns_plan,
    sub_mod_v,
    u64,
)

AXIS = "coef"


def coef_mesh(n_coef: int | None = None, devices=None) -> Mesh:
    devices = jax.devices() if devices is None else devices
    if n_coef is None:
        n_coef = len(devices)
    arr = np.asarray(devices[:n_coef]).reshape(n_coef)
    return Mesh(arr, axis_names=(AXIS,))


def shard_coef(mesh: Mesh, x) -> jnp.ndarray:
    """Place an (..., N) array with its trailing coefficient axis sharded."""
    spec = [None] * (x.ndim - 1) + [AXIS]
    return jax.device_put(x, NamedSharding(mesh, P(*spec)))


@dataclass(frozen=True, eq=False)
class CoefNttPlan:
    """Host-precomputed tables for a D-way coefficient-sharded (qs, n) NTT."""

    qs: tuple[int, ...]
    n: int
    d: int  # device count along the coef axis
    log_d: int
    # cross-shard stage twiddles, per (stage, device, limb): (log_d, D, L, 1)
    cross_tw: np.ndarray
    cross_tw_shoup: np.ndarray
    cross_tw_inv: np.ndarray
    cross_tw_inv_shoup: np.ndarray
    # compact per-device local tables, plan-table layout: (D, L, n/D)
    local_psi: np.ndarray
    local_psi_shoup: np.ndarray
    local_psi_inv: np.ndarray
    local_psi_inv_shoup: np.ndarray
    # per-limb constants
    q_arr: np.ndarray  # (L, 1)
    neg_q_inv: np.ndarray
    r2: np.ndarray
    n_inv: np.ndarray
    n_inv_shoup: np.ndarray


@lru_cache(maxsize=None)
def coef_ntt_plan(qs: tuple[int, ...], n: int, d: int) -> CoefNttPlan:
    assert d & (d - 1) == 0 and d >= 1
    assert n % d == 0 and n // d >= 2, (n, d)
    base = rns_plan(qs, n)
    log_d = d.bit_length() - 1
    m_loc = n // d

    def cross(table):
        # out[l, dev] = table[:, 2^l + (dev >> (log_d - l))]
        out = np.empty((log_d, d, len(qs), 1), dtype=np.uint64)
        for l in range(log_d):
            for dev in range(d):
                out[l, dev, :, 0] = table[:, (1 << l) + (dev >> (log_d - l))]
        return out

    def local(table):
        # T[dev][k] = table[(D+dev)*msb(k) + (k - msb(k))]; row 0 unused
        out = np.empty((d, len(qs), m_loc), dtype=np.uint64)
        out[:, :, 0] = table[:, 0][None, :]
        for k in range(1, m_loc):
            msb = 1 << (k.bit_length() - 1)
            idx = (d + np.arange(d)) * msb + (k - msb)  # (D,)
            out[:, :, k] = table[:, idx].T
        return out

    return CoefNttPlan(
        qs=qs,
        n=n,
        d=d,
        log_d=log_d,
        cross_tw=cross(base.psi_br),
        cross_tw_shoup=cross(base.psi_br_shoup),
        cross_tw_inv=cross(base.psi_inv_br),
        cross_tw_inv_shoup=cross(base.psi_inv_br_shoup),
        local_psi=local(base.psi_br),
        local_psi_shoup=local(base.psi_br_shoup),
        local_psi_inv=local(base.psi_inv_br),
        local_psi_inv_shoup=local(base.psi_inv_br_shoup),
        q_arr=base.q_arr,
        neg_q_inv=base.neg_q_inv,
        r2=base.r2,
        n_inv=base.n_inv,
        n_inv_shoup=base.n_inv_shoup,
    )


def _pairs(d: int, mask: int):
    return [(i, i ^ mask) for i in range(d)]


def coef_ntt_local(x, plan: CoefNttPlan, axis_name: str = AXIS) -> jnp.ndarray:
    """Forward NTT body for one shard (call inside shard_map): (..., L, n/D)
    local block -> the same positions of the full bit-reversed-order NTT."""
    dev = jax.lax.axis_index(axis_name)
    q = jnp.asarray(plan.q_arr)
    x = u64(x)
    for l in range(plan.log_d):
        mask = plan.d >> (l + 1)
        recv = jax.lax.ppermute(x, axis_name, _pairs(plan.d, mask))
        upper = ((dev >> (plan.log_d - l - 1)) & 1) == 1
        t = jnp.take(jnp.asarray(plan.cross_tw[l]), dev, axis=0)  # (L, 1)
        ts = jnp.take(jnp.asarray(plan.cross_tw_shoup[l]), dev, axis=0)
        u = jnp.where(upper, recv, x)
        v = jnp.where(upper, x, recv)
        tv = mul_shoup_v(v, t, ts, q)
        x = jnp.where(upper, sub_mod_v(u, tv, q), add_mod_v(u, tv, q))
    tab = jnp.take(jnp.asarray(plan.local_psi), dev, axis=0)  # (L, n/D)
    tab_s = jnp.take(jnp.asarray(plan.local_psi_shoup), dev, axis=0)
    return fwd_stages(x, tab, tab_s, q)


def coef_intt_local(x, plan: CoefNttPlan, axis_name: str = AXIS) -> jnp.ndarray:
    """Inverse NTT body for one shard: local GS tail first, then the
    log2(D) cross-shard layers in reverse, then the n^-1 scale."""
    dev = jax.lax.axis_index(axis_name)
    q = jnp.asarray(plan.q_arr)
    tab = jnp.take(jnp.asarray(plan.local_psi_inv), dev, axis=0)
    tab_s = jnp.take(jnp.asarray(plan.local_psi_inv_shoup), dev, axis=0)
    x = inv_stages(u64(x), tab, tab_s, q)
    for l in range(plan.log_d - 1, -1, -1):
        mask = plan.d >> (l + 1)
        recv = jax.lax.ppermute(x, axis_name, _pairs(plan.d, mask))
        upper = ((dev >> (plan.log_d - l - 1)) & 1) == 1
        t = jnp.take(jnp.asarray(plan.cross_tw_inv[l]), dev, axis=0)
        ts = jnp.take(jnp.asarray(plan.cross_tw_inv_shoup[l]), dev, axis=0)
        u = jnp.where(upper, recv, x)
        v = jnp.where(upper, x, recv)
        s = add_mod_v(u, v, q)
        dd = mul_shoup_v(sub_mod_v(u, v, q), t, ts, q)
        x = jnp.where(upper, dd, s)
    return mul_shoup_v(x, jnp.asarray(plan.n_inv), jnp.asarray(plan.n_inv_shoup), q)


def _mul_local(a, b, plan: CoefNttPlan):
    ea = coef_ntt_local(a, plan)
    eb = coef_ntt_local(b, plan)
    prod = mul_mod_v(
        ea, eb, jnp.asarray(plan.q_arr), jnp.asarray(plan.neg_q_inv), jnp.asarray(plan.r2)
    )
    return coef_intt_local(prod, plan)


def _specs(ndim: int):
    return P(*([None] * (ndim - 1) + [AXIS]))


def coef_sharded_mul(mesh: Mesh, a, b, qs: tuple[int, ...]) -> jnp.ndarray:
    """Negacyclic coefficient-basis product with the coefficient axis sharded
    over mesh axis 'coef'; bit-identical to ops.rns.rns_mul."""
    plan = coef_ntt_plan(qs, a.shape[-1], mesh.shape[AXIS])
    spec = _specs(a.ndim)
    f = shard_map(
        partial(_mul_local, plan=plan), mesh=mesh, in_specs=(spec, spec), out_specs=spec
    )
    return jax.jit(f)(a, b)


def coef_sharded_ntt(mesh: Mesh, a, qs: tuple[int, ...]) -> jnp.ndarray:
    plan = coef_ntt_plan(qs, a.shape[-1], mesh.shape[AXIS])
    spec = _specs(a.ndim)
    f = shard_map(
        partial(coef_ntt_local, plan=plan), mesh=mesh, in_specs=spec, out_specs=spec
    )
    return jax.jit(f)(a)


def coef_sharded_intt(mesh: Mesh, a, qs: tuple[int, ...]) -> jnp.ndarray:
    plan = coef_ntt_plan(qs, a.shape[-1], mesh.shape[AXIS])
    spec = _specs(a.ndim)
    f = shard_map(
        partial(coef_intt_local, plan=plan), mesh=mesh, in_specs=spec, out_specs=spec
    )
    return jax.jit(f)(a)
