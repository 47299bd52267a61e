"""Checkpoint / resume: save and load of (partitioned) CSR matrices.

The reference has no persistence layer at all -- every multiply is a one-shot
call (SURVEY section 5).  For production inverse-problem pipelines (the
reference's motivating workload computes covariance products over matrices
built once and reused across many runs, ``/root/reference/README.md:140``)
this module adds durable storage:

* :func:`save_csr` / :func:`load_csr` -- one ``.npz`` per matrix, exact
  round-trip of a :class:`~sparse_matrix_mult_tpu.types.CSRMatrix` (or a
  scipy CSR), with capacity re-bucketing on load.
* :func:`save_partitioned` / :func:`load_partitioned` -- one ``.npz`` per
  row shard, sized by the flop-balanced partitioner, so a multi-host job can
  load only its own shards (each host reads ``shards[process_index::count]``).
* :func:`load_sharded_result` -- reassemble a saved partitioned matrix into
  one scipy CSR (host-side stitch via the native runtime).

Format: numpy ``.npz`` with keys ``indptr``/``indices``/``data``/``shape``
(+ ``row0`` for shards).  Plain npz keeps checkpoints readable by scipy users
without this package.
"""

from __future__ import annotations

import json
import os
from typing import Sequence

import numpy as np
import scipy.sparse as sp

from .parallel.partition import equal_rows_partition, flop_balanced_partition
from .types import CSRMatrix, from_scipy, to_scipy
from .utils.native import stitch_csr

__all__ = [
    "save_csr",
    "load_csr",
    "save_partitioned",
    "load_partitioned",
    "load_sharded_result",
    "load_sharded_operand",
]


def _as_scipy(mat) -> sp.csr_matrix:
    if isinstance(mat, CSRMatrix):
        return to_scipy(mat)
    if sp.issparse(mat):
        return mat.tocsr()
    return sp.csr_matrix(np.asarray(mat))


def save_csr(path: str, mat) -> None:
    """Save a CSRMatrix / scipy CSR / dense array as one ``.npz`` file."""
    m = _as_scipy(mat)
    np.savez_compressed(
        path,
        indptr=np.asarray(m.indptr, np.int64),
        indices=np.asarray(m.indices, np.int32),
        data=np.asarray(m.data),
        shape=np.asarray(m.shape, np.int64),
    )


def load_csr(path: str, device: bool = False, dtype=None):
    """Load a matrix saved by :func:`save_csr`.

    ``device=True`` returns a device-resident :class:`CSRMatrix` (bucketed
    capacity); otherwise a scipy CSR.
    """
    with np.load(path) as z:
        m = sp.csr_matrix(
            (z["data"], z["indices"], z["indptr"]), shape=tuple(z["shape"])
        )
    if device:
        return from_scipy(m, dtype=dtype)
    return m


def _shard_path(prefix: str, i: int) -> str:
    return f"{prefix}.shard{i:05d}.npz"


def _meta_path(prefix: str) -> str:
    return f"{prefix}.meta.json"


def save_partitioned(
    prefix: str,
    mat,
    n_shards: int,
    b_indptr=None,
) -> list[str]:
    """Save ``mat`` as ``n_shards`` contiguous row-range shard files.

    Row ranges are flop-balanced when ``b_indptr`` (the row pointers of the
    matrix it will be multiplied with) is given -- the persisted analogue of
    the reference's ``limits()`` work division
    (``/root/reference/src/workdivision.cpp:16-89``) -- and equal-row
    otherwise.  Returns the shard paths; writes ``<prefix>.meta.json``.
    """
    m = _as_scipy(mat)
    rows = m.shape[0]
    if b_indptr is not None:
        from .parallel.partition import row_flops

        bounds = flop_balanced_partition(
            row_flops(m.indptr, m.indices, b_indptr), n_shards
        )
    else:
        bounds = equal_rows_partition(rows, n_shards)
    paths = []
    shard_nnz = []
    for i in range(len(bounds) - 1):
        lo, hi = int(bounds[i]), int(bounds[i + 1])
        sub = m[lo:hi]
        path = _shard_path(prefix, i)
        np.savez_compressed(
            path,
            indptr=np.asarray(sub.indptr, np.int64),
            indices=np.asarray(sub.indices, np.int32),
            data=np.asarray(sub.data),
            shape=np.asarray(sub.shape, np.int64),
            row0=np.asarray([lo], np.int64),
        )
        paths.append(path)
        shard_nnz.append(int(sub.nnz))
    with open(_meta_path(prefix), "w") as f:
        json.dump(
            {
                "shape": [int(s) for s in m.shape],
                "n_shards": len(paths),
                "bounds": [int(b) for b in bounds],
                "dtype": str(m.dtype),
                # Lets load_sharded_operand size capacities without opening
                # any shard file it does not own.
                "shard_nnz": shard_nnz,
            },
            f,
        )
    return paths


def load_partitioned(
    prefix: str,
    shard_ids: Sequence[int] | None = None,
    device: bool = False,
    dtype=None,
):
    """Load shards saved by :func:`save_partitioned`.

    ``shard_ids`` selects a subset (e.g. this host's shards on a multi-host
    job); default all.  Returns ``(shards, meta)`` where each shard is a
    scipy CSR (or device :class:`CSRMatrix` with ``device=True``) carrying
    its global starting row in ``meta['bounds']``.
    """
    with open(_meta_path(prefix)) as f:
        meta = json.load(f)
    ids = list(shard_ids) if shard_ids is not None else range(meta["n_shards"])
    shards = []
    for i in ids:
        with np.load(_shard_path(prefix, i)) as z:
            m = sp.csr_matrix(
                (z["data"], z["indices"], z["indptr"]), shape=tuple(z["shape"])
            )
        shards.append(from_scipy(m, dtype=dtype) if device else m)
    return shards, meta


def load_sharded_result(prefix: str) -> sp.csr_matrix:
    """Reassemble a partitioned save into one scipy CSR (native stitch)."""
    shards, meta = load_partitioned(prefix)
    rows, cols = meta["shape"]
    return stitch_csr(shards, rows, cols)


def load_sharded_operand(prefix: str, mesh=None, dtype=None):
    """Load a partitioned save directly into a row-sharded device operand.

    Bridges the persistence layer to the distributed compute path: when the
    save's shard count matches the mesh, each shard file is read lazily in
    the placement callback, so a multi-host process touches only the files
    backing its own addressable devices -- the persisted counterpart of the
    reference's per-thread row ranges (``workdivision.cpp:16-89``) scaled to
    a pod slice.  Mismatched shard counts fall back to stitch + re-shard.
    Returns a :class:`~...parallel.distributed.ShardedCSR`.
    """
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from .parallel.distributed import ShardedCSR, shard_csr
    from .parallel.mesh import row_mesh
    from .types import bucket_capacity

    mesh = mesh or row_mesh()
    (axis,) = mesh.axis_names
    s_count = mesh.devices.size
    with open(_meta_path(prefix)) as f:
        meta = json.load(f)
    if meta["n_shards"] != s_count:
        return shard_csr(load_sharded_result(prefix), mesh, dtype=dtype)

    bounds = tuple(int(b) for b in meta["bounds"])
    m, n = (int(x) for x in meta["shape"])
    rows_pad = max(
        max(b1 - b0 for b0, b1 in zip(bounds[:-1], bounds[1:])), 1
    )
    if dtype is None:
        dtype = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
    # Per-shard nnz: from the meta when present, else one cheap header read.
    shard_nnz = meta.get("shard_nnz")
    if shard_nnz is None:
        shard_nnz = []
        for i in range(s_count):
            with np.load(_shard_path(prefix, i)) as z:
                shard_nnz.append(int(z["indptr"][-1]))
    cap = bucket_capacity(max(max(shard_nnz), 1))

    cache: dict = {}

    def _shard_arrays(s: int):
        if s not in cache:
            with np.load(_shard_path(prefix, s)) as z:
                rows_here = bounds[s + 1] - bounds[s]
                nnz = int(z["indptr"][-1])
                ip = np.zeros(rows_pad + 1, np.int32)
                ip[: rows_here + 1] = z["indptr"]
                ip[rows_here + 1 :] = nnz
                ix = np.zeros(cap, np.int32)
                ix[:nnz] = z["indices"]
                vv = np.zeros(cap, np.dtype(dtype))
                vv[:nnz] = z["data"]
            cache[s] = (ip, ix, vv)
        return cache[s]

    def put(kind: int, shape):
        sh = NamedSharding(mesh, P(axis, *([None] * (len(shape) - 1))))

        def cb(idx):
            s = idx[0].start or 0
            return _shard_arrays(s)[kind][None]

        return jax.make_array_from_callback(shape, sh, cb)

    ip = put(0, (s_count, rows_pad + 1))
    ix = put(1, (s_count, cap))
    vv = put(2, (s_count, cap))
    cache.clear()
    return ShardedCSR(ip, ix, vv, (m, n), bounds)
