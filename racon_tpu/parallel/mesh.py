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


def process_shard() -> tuple:
    """(shard_id, num_shards) for multi-host window sharding.

    Real multi-host runs use the JAX process topology (after
    initialize_distributed); single-process runs return (0, 1) WITHOUT
    touching jax.process_index() — that initializes the device backend,
    which a host-only run (--engine oracle/native) must never do (a TPU
    plugin whose transport is down hangs for minutes in backend setup).
    """
    import os
    from jax._src import distributed
    if (not os.environ.get("RACON_TPU_COORDINATOR")
            and distributed.global_state.client is None):
        return 0, 1
    return jax.process_index(), jax.process_count()


def allgather_bytes(pieces, shard_id: int, num_shards: int):
    """All-gather variable-length byte strings across hosts.

    pieces: list of (index, bytes) owned by this shard.  Returns the full
    {index: bytes} map, identical on every host (DCN allgather of padded
    uint8 arrays; lengths gathered alongside).  Deterministic: entries are
    keyed by global window index, so stitching order never depends on
    which host computed what (reference stitches sequentially,
    src/polisher.cpp:510-531).
    """
    if num_shards == 1:
        return dict(pieces)
    from jax.experimental import multihost_utils

    max_len = max((len(b) for _, b in pieces), default=0)
    max_n = len(pieces)
    # every process must contribute identically-shaped arrays
    dims = np.asarray([max_n, max_len], np.int32)
    all_dims = np.asarray(multihost_utils.process_allgather(dims))
    n_pad = int(all_dims[:, 0].max())
    l_pad = int(all_dims[:, 1].max())

    idx = np.full((n_pad,), -1, np.int32)
    lens = np.zeros((n_pad,), np.int32)
    buf = np.zeros((n_pad, max(l_pad, 1)), np.uint8)
    for j, (i, b) in enumerate(pieces):
        idx[j] = i
        lens[j] = len(b)
        buf[j, :len(b)] = np.frombuffer(b, np.uint8)

    g_idx = np.asarray(multihost_utils.process_allgather(idx))
    g_lens = np.asarray(multihost_utils.process_allgather(lens))
    g_buf = np.asarray(multihost_utils.process_allgather(buf))

    out = {}
    for s in range(g_idx.shape[0]):
        for j in range(g_idx.shape[1]):
            i = int(g_idx[s, j])
            if i < 0:
                continue
            out[i] = g_buf[s, j, :int(g_lens[s, j])].tobytes()
    return out
