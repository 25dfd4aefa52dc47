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
    assert shares.shape[0] == mesh.shape["party"]
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
        total = jax.lax.psum(part, axis_name="party")
        return total % np.uint64(q)

    return _merge(jnp.asarray(shares, dtype=jnp.uint64))
