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


def initialize_distributed(coordinator_address: Optional[str] = None,
                           num_processes: Optional[int] = None,
                           process_id: Optional[int] = None,
                           **kwargs) -> int:
    """Join a multi-host training job (``jax.distributed.initialize``).

    The reference has no multi-node story at all (SURVEY §2: OpenMP
    threads + one optional GPU, no NCCL/MPI); this is the TPU-native
    entry the rebuild adds.  Call once per process before any JAX
    computation; afterwards ``jax.devices()`` returns the GLOBAL device
    list and ``get_mesh()`` builds a mesh spanning all hosts, so the
    same driver code (``sharding="dp+tp"``) trains across hosts with
    XLA collectives riding ICI within a slice and DCN across slices.

    On TPU pods all arguments are auto-detected from the environment;
    on CPU/GPU pass ``coordinator_address`` ("host:port"),
    ``num_processes`` and ``process_id``.  Returns the global device
    count.  No-op if the distributed runtime is already initialized.
    """
    import jax
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes, process_id=process_id, **kwargs)
    except RuntimeError as err:
        # double-init is a no-op; JAX's message is "distributed.initialize
        # should only be called once." (jax/_src/distributed.py)
        msg = str(err)
        if "already initialized" not in msg and \
                "only be called once" not in msg:
            raise
    return jax.device_count()


def host_local_copy(array) -> np.ndarray:
    """Materialize a (possibly multi-host sharded) array on this host.

    ``np.asarray`` only works when every shard is process-addressable;
    for cross-host arrays the shards are all-gathered over the wire
    first (``multihost_utils.process_allgather`` semantics).
    """
    import jax
    if getattr(array, "is_fully_addressable", True):
        return np.asarray(array)
    from jax.experimental import multihost_utils
    return np.asarray(multihost_utils.process_allgather(array, tiled=True))
