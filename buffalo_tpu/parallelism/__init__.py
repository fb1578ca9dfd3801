"""Device mesh and sharding helpers.

The reference is single-node (OpenMP threads + one optional GPU; no
NCCL/MPI anywhere — SURVEY §2 table).  Here parallelism is expressed
the TPU way: a 1-D ``jax.sharding.Mesh`` over all chips with named
shardings; XLA inserts the collectives (all-gather of gathered factor
rows, psum for gramians, scatter into row-sharded tables).

Two axes of parallelism for matrix factorization:
  * ``dp``  — batch rows of a padded batch sharded over chips
              (compute-parallel solves; the default)
  * ``tp``  — factor tables row-sharded over chips (memory-parallel,
              for tables larger than one chip's HBM)
Both compose; ``shard_batch``/``shard_rows`` produce the
NamedShardings used by the training steps.
"""
from __future__ import annotations

from typing import Optional, Sequence

import numpy as np


def get_mesh(num_devices: Optional[int] = None, axis_name: str = "d",
             devices: Optional[Sequence] = None):
    import jax
    from jax.sharding import Mesh
    if devices is None:
        devices = jax.devices()
    if num_devices is not None:
        devices = devices[:num_devices]
    return Mesh(np.asarray(devices), (axis_name,))


def shard_rows(mesh, axis_name: str = "d"):
    """Shard the leading (row) dimension of a table across the mesh."""
    from jax.sharding import NamedSharding, PartitionSpec
    return NamedSharding(mesh, PartitionSpec(axis_name))


def shard_batch(mesh, axis_name: str = "d"):
    """Shard the batch dimension of a padded batch across the mesh."""
    from jax.sharding import NamedSharding, PartitionSpec
    return NamedSharding(mesh, PartitionSpec(axis_name))


def replicated(mesh):
    from jax.sharding import NamedSharding, PartitionSpec
    return NamedSharding(mesh, PartitionSpec())


def num_devices() -> int:
    import jax
    return jax.device_count()
