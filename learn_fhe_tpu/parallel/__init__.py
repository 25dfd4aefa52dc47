"""Scale-out layer: device meshes, sharded batched-bootstrap pipelines."""

from .batch import (
    fhew_bootstrap_batch,
    fhew_gate_batch,
    tfhe_pbs_batch,
    tfhe_pbs_batch_device,
)
from .mesh import make_mesh, replicate, shard_batch, shard_limbs

__all__ = [
    "fhew_bootstrap_batch",
    "fhew_gate_batch",
    "make_mesh",
    "replicate",
    "shard_batch",
    "shard_limbs",
    "tfhe_pbs_batch",
    "tfhe_pbs_batch_device",
]
