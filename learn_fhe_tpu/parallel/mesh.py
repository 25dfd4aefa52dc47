"""Device mesh construction and sharding helpers.

The parallel axes are the ones SURVEY.md §2.5 identifies in the data layout:
- 'batch': independent ciphertexts (gate bootstraps, FhewU8 bit lanes) --
  embarrassingly parallel, the throughput axis;
- 'limb': RNS primes of a CKKS ciphertext -- per-limb ops are local, the two
  cross-limb reductions (base extension / rescale) contract over it.

Collectives ride ICI inside a slice; XLA inserts them from shardings.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_batch: int | None = None, n_limb: int = 1, devices=None
) -> Mesh:
    devices = jax.devices() if devices is None else devices
    n = len(devices)
    if n_batch is None:
        n_batch = n // n_limb
    assert n_batch * n_limb == n, (n_batch, n_limb, n)
    arr = np.asarray(devices).reshape(n_batch, n_limb)
    return Mesh(arr, axis_names=("batch", "limb"))


def shard_batch(mesh: Mesh, x, batch_axis: int = 0):
    """Place an array with its leading batch axis split over the mesh."""
    spec = [None] * x.ndim
    spec[batch_axis] = "batch"
    return jax.device_put(x, NamedSharding(mesh, P(*spec)))


def shard_limbs(mesh: Mesh, x, limb_axis: int = -2):
    """Place an RNS array with its limb axis split over the mesh."""
    spec = [None] * x.ndim
    spec[limb_axis % x.ndim] = "limb"
    return jax.device_put(x, NamedSharding(mesh, P(*spec)))


def replicate(mesh: Mesh, x):
    return jax.device_put(x, NamedSharding(mesh, P()))
