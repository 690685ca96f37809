"""Device mesh + sharding for the batched POA engine.

The framework's distribution model (replacing the reference's thread pool +
multi-GPU mutex queues, SURVEY.md §2d):

  * one data-parallel axis ("dp") over all devices — window megabatches are
    sharded along the leading batch axis; every other array dimension is
    replicated,
  * multi-host: `jax.distributed.initialize()` then the same mesh spanning
    all hosts (ICI within a slice, DCN across hosts),
  * deterministic static partitioning — no work stealing; buckets are
    depth-sorted so shards receive balanced work.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DP_AXIS = "dp"


def initialize_distributed() -> None:
    """Multi-host setup (no-op for single host).  Controlled by the standard
    JAX coordination env vars."""
    if os.environ.get("RACON_TPU_COORDINATOR"):
        jax.distributed.initialize(
            coordinator_address=os.environ["RACON_TPU_COORDINATOR"],
            num_processes=int(os.environ.get("RACON_TPU_NUM_PROCESSES", "1")),
            process_id=int(os.environ.get("RACON_TPU_PROCESS_ID", "0")))


def make_mesh(n_devices: Optional[int] = None) -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (DP_AXIS,))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (window-batch) axis; replicate the rest."""
    return NamedSharding(mesh, P(DP_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_pytree_batch(tree, mesh: Mesh):
    """Place every array in the pytree with its leading axis sharded on dp."""
    sh = batch_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)


def pad_batch_to_mesh(n: int, mesh: Mesh) -> int:
    """Batch sizes must divide evenly across the dp axis."""
    k = mesh.shape[DP_AXIS]
    return -(-n // k) * k
