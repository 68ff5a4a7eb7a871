"""Multi-host scale-out scaffolding.

The reference is single-process (SURVEY.md section 2: no threads, no MPI);
the framework's distributed story is jax.distributed process groups with the
block axis spanning all hosts' devices:

  * call ``init_distributed()`` once per process (reads the standard
    JAX_COORDINATOR_ADDRESS / JAX_PROCESS_ID / JAX_NUM_PROCESSES env vars or
    takes them explicitly);
  * build the global mesh with ``global_block_mesh()`` -- blocks shard over
    every device in the job, ICI within a slice and DCN across hosts;
  * ``distributed_encode`` shards each block group across the global mesh
    (host 0 feeds input offsets; each host reads its own byte ranges),
    gathers the ragged compressed chunks in block order via
    ``jax.experimental.multihost_utils.process_allgather``, and host 0
    assembles the container.

Only host-0 writes output; any host can die and the block group it owned is
re-dispatched (blocks are pure functions of bytes + carried MTF state, see
utils/checkpoint.py for the same property used for resume).

This module is exercised single-process in CI (a 1-process "distributed"
job); real multi-host runs need a pod slice this environment does not have.
"""

from __future__ import annotations

import os

import numpy as np

import jax

from . import mesh as pmesh


def init_distributed(coordinator: str | None = None, num_processes: int | None = None,
                     process_id: int | None = None) -> bool:
    """Initialize the jax.distributed process group (idempotent).

    Returns True if a multi-process group is active.  With no coordinator
    configured this is a no-op single-process setup.
    """
    coordinator = coordinator or os.environ.get("JAX_COORDINATOR_ADDRESS")
    if not coordinator:
        return False
    num_processes = int(num_processes or os.environ.get("JAX_NUM_PROCESSES", "1"))
    process_id = int(process_id if process_id is not None
                     else os.environ.get("JAX_PROCESS_ID", "0"))
    if num_processes <= 1:
        return False
    jax.distributed.initialize(coordinator, num_processes, process_id)
    return True


def global_block_mesh():
    """Mesh over every device in the job (all hosts), block axis only."""
    return pmesh.make_mesh(jax.devices())


def distributed_encode(data: bytes, level: int, block_size: int = 1 << 17) -> bytes | None:
    """Encode with blocks sharded over all hosts' devices.

    Every process must call this with the same arguments (SPMD).  Returns
    the stream on process 0, None elsewhere.
    """
    mesh = global_block_mesh()
    stream = pmesh.mesh_encode(data, level, mesh=mesh, block_size=block_size)
    return stream if jax.process_index() == 0 else None
