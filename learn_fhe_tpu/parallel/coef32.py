"""Coefficient-axis (N) sharded negacyclic NTT for the u32 engine (q < 2^31).

`parallel/coef.py` shards the u64/RNS transform (`ops/rns.py`) — the CKKS
engine. This module gives the SAME in-place split to the u32 engine
(`ops/ntt32.py`) that underlies FHEW (q ~ 2^28) and the CRT torus multiplier
driving TFHE: the repo's fast transform, 129k polymuls/s at N=2^14 single
chip, now scalable over a mesh axis too. Reference analogue: the serial
butterfly loops `util/src/ring/fft.rs:40-77` (no parallelism exists there).

Split (identical to coef.py's, see its module docstring for the derivation):
layers 0..log2(D)-1 pair whole shards — partner = device XOR D>>(l+1), the
twiddle is a PER-DEVICE SCALAR psi_br[2^l + top-l-bits(dev)], one ppermute
of the local block each; layers log2(D).. run the standard table-driven
stages on a compact per-device table T[d][k] = psi_br[(D+d)*msb(k)+k-msb(k)].

Every modular op here (add/sub/mul_shoup32) returns the canonical reduced
value, so ANY correct layer decomposition yields bit-identical arrays — the
sharded transform equals `ntt32`/`intt32` element-for-element (asserted in
tests/test_parallel.py), even though the local tail is radix-2 where the
single-device path fuses radix-4/8 passes.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

try:  # jax >= 0.4.35 exports shard_map at top level
    from jax import shard_map
except ImportError:  # pragma: no cover - older jax
    from jax.experimental.shard_map import shard_map

from ..ops.modular32 import add_mod32, mul_shoup32, sub_mod32, u32
from ..ops.ntt32 import ntt32_plan
from .coef import AXIS, _pairs, _specs


@dataclass(frozen=True, eq=False)
class Coef32Plan:
    """Host tables for a D-way coefficient-sharded (q, n) u32 NTT."""

    q: int
    n: int
    d: int
    log_d: int
    cross_tw: np.ndarray  # (log_d, D) u32 per-device scalar twiddles
    cross_tw_shoup: np.ndarray
    cross_tw_inv: np.ndarray
    cross_tw_inv_shoup: np.ndarray
    local_psi: np.ndarray  # (D, n/D) plan-table layout
    local_psi_shoup: np.ndarray
    local_psi_inv: np.ndarray
    local_psi_inv_shoup: np.ndarray
    n_inv: int
    n_inv_shoup: int


@lru_cache(maxsize=None)
def coef32_plan(q: int, n: int, d: int) -> Coef32Plan:
    assert d & (d - 1) == 0 and d >= 1
    assert n % d == 0 and n // d >= 2, (n, d)
    base = ntt32_plan(q, n)
    log_d = d.bit_length() - 1
    m_loc = n // d

    def cross(table):
        out = np.empty((log_d, d), dtype=np.uint32)
        for l in range(log_d):
            for dev in range(d):
                out[l, dev] = table[(1 << l) + (dev >> (log_d - l))]
        return out

    def local(table):
        out = np.empty((d, m_loc), dtype=np.uint32)
        out[:, 0] = table[0]
        for k in range(1, m_loc):
            msb = 1 << (k.bit_length() - 1)
            out[:, k] = table[(d + np.arange(d)) * msb + (k - msb)]
        return out

    return Coef32Plan(
        q=q,
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
        n_inv=base.n_inv,
        n_inv_shoup=base.n_inv_shoup,
    )


def _fwd_local_stages(x, tab, tab_s, q: int):
    """DIT tail on one shard: table-driven radix-2 layers over a traced
    (m,) plan-layout table (m = local length)."""
    m = x.shape[-1]
    batch = x.shape[:-1]
    layers = m.bit_length() - 1
    for l in range(layers):
        blocks = 1 << l
        half = m >> (l + 1)
        v = x.reshape(*batch, blocks, 2, half)
        u_, w_ = v[..., 0, :], v[..., 1, :]
        t = tab[blocks : 2 * blocks][:, None]
        ts = tab_s[blocks : 2 * blocks][:, None]
        tw = mul_shoup32(w_, t, ts, q)
        x = jnp.stack(
            [add_mod32(u_, tw, q), sub_mod32(u_, tw, q)], axis=-2
        ).reshape(*batch, m)
    return x


def _inv_local_stages(x, tab, tab_s, q: int):
    """GS head on one shard (bit-reversed -> normal), no n^-1 scale."""
    m = x.shape[-1]
    batch = x.shape[:-1]
    layers = m.bit_length() - 1
    for l in range(layers - 1, -1, -1):
        blocks = 1 << l
        half = m >> (l + 1)
        v = x.reshape(*batch, blocks, 2, half)
        u_, w_ = v[..., 0, :], v[..., 1, :]
        t = tab[blocks : 2 * blocks][:, None]
        ts = tab_s[blocks : 2 * blocks][:, None]
        s = add_mod32(u_, w_, q)
        dd = mul_shoup32(sub_mod32(u_, w_, q), t, ts, q)
        x = jnp.stack([s, dd], axis=-2).reshape(*batch, m)
    return x


def coef32_ntt_local(x, plan: Coef32Plan, axis_name: str = AXIS) -> jnp.ndarray:
    """Forward u32 NTT body for one shard (call inside shard_map)."""
    dev = jax.lax.axis_index(axis_name)
    q = plan.q
    x = u32(x)
    for l in range(plan.log_d):
        mask = plan.d >> (l + 1)
        recv = jax.lax.ppermute(x, axis_name, _pairs(plan.d, mask))
        upper = ((dev >> (plan.log_d - l - 1)) & 1) == 1
        t = jnp.take(jnp.asarray(plan.cross_tw[l]), dev)
        ts = jnp.take(jnp.asarray(plan.cross_tw_shoup[l]), dev)
        u_ = jnp.where(upper, recv, x)
        v = jnp.where(upper, x, recv)
        tv = mul_shoup32(v, t, ts, q)
        x = jnp.where(upper, sub_mod32(u_, tv, q), add_mod32(u_, tv, q))
    tab = jnp.take(jnp.asarray(plan.local_psi), dev, axis=0)
    tab_s = jnp.take(jnp.asarray(plan.local_psi_shoup), dev, axis=0)
    return _fwd_local_stages(x, tab, tab_s, q)


def coef32_intt_local(x, plan: Coef32Plan, axis_name: str = AXIS) -> jnp.ndarray:
    """Inverse u32 NTT body for one shard: local GS head, cross layers in
    reverse, then the n^-1 scale."""
    dev = jax.lax.axis_index(axis_name)
    q = plan.q
    tab = jnp.take(jnp.asarray(plan.local_psi_inv), dev, axis=0)
    tab_s = jnp.take(jnp.asarray(plan.local_psi_inv_shoup), dev, axis=0)
    x = _inv_local_stages(u32(x), tab, tab_s, q)
    for l in range(plan.log_d - 1, -1, -1):
        mask = plan.d >> (l + 1)
        recv = jax.lax.ppermute(x, axis_name, _pairs(plan.d, mask))
        upper = ((dev >> (plan.log_d - l - 1)) & 1) == 1
        t = jnp.take(jnp.asarray(plan.cross_tw_inv[l]), dev)
        ts = jnp.take(jnp.asarray(plan.cross_tw_inv_shoup[l]), dev)
        u_ = jnp.where(upper, recv, x)
        v = jnp.where(upper, x, recv)
        s = add_mod32(u_, v, q)
        dd = mul_shoup32(sub_mod32(u_, v, q), t, ts, q)
        x = jnp.where(upper, dd, s)
    return mul_shoup32(x, np.uint32(plan.n_inv), np.uint32(plan.n_inv_shoup), q)


def _mul_local32(a, b, plan: Coef32Plan):
    from ..ops.ntt32 import pointwise_mul32

    ea = coef32_ntt_local(a, plan)
    eb = coef32_ntt_local(b, plan)
    ew = pointwise_mul32(ea, eb, ntt32_plan(plan.q, plan.n))
    return coef32_intt_local(ew, plan)


def coef32_sharded_mul(mesh: Mesh, a, b, q: int) -> jnp.ndarray:
    """Negacyclic u32 product with the coefficient axis sharded over mesh
    axis 'coef'; bit-identical to ops.ntt32.negacyclic_mul32."""
    plan = coef32_plan(q, a.shape[-1], mesh.shape[AXIS])
    spec = _specs(a.ndim)
    f = shard_map(
        partial(_mul_local32, plan=plan), mesh=mesh, in_specs=(spec, spec), out_specs=spec
    )
    return jax.jit(f)(a, b)


def coef32_sharded_ntt(mesh: Mesh, a, q: int) -> jnp.ndarray:
    plan = coef32_plan(q, a.shape[-1], mesh.shape[AXIS])
    spec = _specs(a.ndim)
    f = shard_map(
        partial(coef32_ntt_local, plan=plan), mesh=mesh, in_specs=spec, out_specs=spec
    )
    return jax.jit(f)(a)


def coef32_sharded_intt(mesh: Mesh, a, q: int) -> jnp.ndarray:
    plan = coef32_plan(q, a.shape[-1], mesh.shape[AXIS])
    spec = _specs(a.ndim)
    f = shard_map(
        partial(coef32_intt_local, plan=plan), mesh=mesh, in_specs=spec, out_specs=spec
    )
    return jax.jit(f)(a)
