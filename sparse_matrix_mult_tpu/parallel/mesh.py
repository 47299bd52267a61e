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


def init_distributed(coordinator: str | None = None, **kw) -> None:
    """Initialize the multi-host process group (DCN).

    Thin wrapper over ``jax.distributed.initialize``; call once per host
    before building meshes on a multi-host pod slice.  No-op when JAX already
    runs single-process with all devices visible.
    """
    if jax.process_count() > 1:
        return
    kwargs = dict(kw)
    if coordinator is not None:
        kwargs["coordinator_address"] = coordinator
    try:
        jax.distributed.initialize(**kwargs)
    except (RuntimeError, ValueError):
        # Already initialized or single-process run; both are fine.
        pass
