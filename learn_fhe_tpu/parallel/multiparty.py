"""Multi-party share merging as mesh collectives (SURVEY.md §2.5: the
multi-party axis; share merges are additive, i.e. psum-shaped).

In the reference all parties live in one process and merging is a Python
fold. At scale each party's share lives on its own device/host; merging a
batch of additive shares is one `psum` over the 'party' mesh axis, riding
ICI. Raw u64 sums cannot overflow for any realistic party count (shares are
reduced mod q < 2^63), so the modular fold is a single reduction + one
Barrett reduce.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

try:  # jax >= 0.4.35 exports shard_map at top level; experimental is deprecated
    from jax import shard_map
except ImportError:  # pragma: no cover - older jax
    from jax.experimental.shard_map import shard_map


def party_mesh(n_parties: int | None = None, devices=None) -> Mesh:
    devices = jax.devices() if devices is None else devices
    if n_parties is None:
        n_parties = len(devices)
    arr = np.asarray(devices[:n_parties]).reshape(n_parties)
    return Mesh(arr, axis_names=("party",))


def shard_parties(mesh: Mesh, shares: jnp.ndarray) -> jnp.ndarray:
    """Place a stacked (P, ...) share array one party per device."""
    spec = ["party"] + [None] * (shares.ndim - 1)
    return jax.device_put(shares, NamedSharding(mesh, P(*spec)))


def merge_shares(mesh: Mesh, shares: jnp.ndarray, q: int) -> jnp.ndarray:
    """sum_p shares[p] mod q with the party axis sharded over the mesh.

    shares: (P, ...) with values already reduced mod q; returns (...)
    replicated on every device. The cross-device traffic is ONE psum of the
    share payload over ICI — the collective equivalent of the reference's
    sequential merge loops (`lwe.rs:228-237`, `rlwe.rs:316-323`).
    """
    # multiple shares per device are folded locally before the psum, so the
    # party count only needs to tile the mesh axis
    assert shares.shape[0] % mesh.shape["party"] == 0
    n_parties = shares.shape[0]
    assert n_parties * (q - 1) < (1 << 64), "raw u64 psum would overflow"

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=P("party", *([None] * (shares.ndim - 1))),
        out_specs=P(*([None] * (shares.ndim - 1))),
    )
    def _merge(local):  # (P/n_devices, ...)
        part = jnp.sum(local, axis=0, dtype=jnp.uint64)
        # The TPU AOT compiler only lowers all-reduces whose region is a
        # plain native-dtype add — u64 (emulated from u32 pairs) is rejected
        # ("Supported lowering only of Sum all reduce", observed on v5e).
        # psum four 16-bit pieces on native u32 lanes instead: exact for up
        # to 2^16 devices, and the wrapping-u64 recombine is the exact sum.
        pieces = jnp.stack(
            [(part >> np.uint64(16 * k)).astype(jnp.uint32) & np.uint32(0xFFFF) for k in range(4)]
        )
        tot = jax.lax.psum(pieces, axis_name="party")  # (4, ...), replicated
        total = tot[0].astype(jnp.uint64)
        for k in range(1, 4):
            total = total + (tot[k].astype(jnp.uint64) << np.uint64(16 * k))
        return total % np.uint64(q)

    return _merge(jnp.asarray(shares, dtype=jnp.uint64))
