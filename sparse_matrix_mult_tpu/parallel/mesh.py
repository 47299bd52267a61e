"""Device-mesh construction and multi-host initialization.

The reference has no distributed layer at all (its only parallelism is OpenMP
threads in one address space, ``/root/reference/src/sparse_sparse_sparse.cpp:90``);
this module is the new first-class communication backend called for in the
rebuild plan: a 1D ``jax.sharding.Mesh`` over all chips for row-partitioned
SpGEMM, with ``jax.distributed`` handling the multi-host DCN process group.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import get_config

__all__ = ["row_mesh", "row_sharding", "replicated_sharding", "init_distributed"]


def row_mesh(devices: Optional[Sequence[jax.Device]] = None, axis: str | None = None) -> Mesh:
    """1D mesh over the given (default: all) devices."""
    axis = axis or get_config().mesh_axis
    devices = list(devices) if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (axis,))


def row_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (row) dimension across the mesh."""
    (axis,) = mesh.axis_names
    return NamedSharding(mesh, P(axis))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def init_distributed(
    coordinator: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
    **kw,
) -> None:
    """Initialize the multi-host process group (DCN).

    Wrapper over ``jax.distributed.initialize``; call once per host before
    building meshes on a multi-host pod slice.  Idempotent: a no-op when the
    process group is already initialized (checked via the distributed client
    handle, not ``process_count()``, which is 1 until initialization).
    Initialization errors propagate -- multi-host failures must be loud
    (SURVEY.md section 5: no silent fallbacks).
    """
    from jax._src import distributed as _dist

    if getattr(_dist.global_state, "client", None) is not None:
        return  # already initialized; second initialize would raise
    kwargs = dict(kw)
    if coordinator is not None:
        kwargs["coordinator_address"] = coordinator
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    jax.distributed.initialize(**kwargs)
