"""Multi-chip SpGEMM: row-sharded A, ring-rotated B blocks over ICI.

The reference's only parallelism is OpenMP threads over contiguous row ranges
in one address space (``/root/reference/src/workdivision.cpp:16-89``,
``sparse_sparse_sparse.cpp:90-110``).  The TPU-native scale-out dimension is a
1D device mesh:

* **A and C are row-sharded** -- each chip owns ``m / n`` output rows, the
  direct analogue of the reference's per-thread row ranges.
* **B is row-sharded along the contraction dimension** and *ring-rotated*:
  at step ``s`` chip ``d`` holds B row-block ``(d + s) mod n``, contracts it
  against the matching column-block of its local A rows, accumulates into its
  local C block, and forwards the B block to its left neighbour via
  ``lax.ppermute``.  After ``n`` steps every chip has seen every B block while
  only ever storing ``1/n`` of B -- the transfer rides the ICI ring and
  overlaps with the MXU contraction (XLA pipelines the ppermute with the
  dot).  This is the structural replacement for the reference's "every thread
  reads all of B from shared memory".

All entry points accept :class:`CSRMatrix` operands and densify *per shard*,
so no chip ever materializes a full dense B.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental.shard_map import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.convert import dense_to_csr
from ..types import CSRMatrix
from .mesh import row_mesh

__all__ = [
    "ring_matmul",
    "spgemm_dense_distributed",
    "spgemm_csr_distributed",
    "ShardedCSR",
    "triple_product_distributed",
    "pad_to_multiple",
]


def pad_to_multiple(x: jax.Array, axis: int, multiple: int) -> jax.Array:
    """Zero-pad ``x`` along ``axis`` up to the next multiple (static)."""
    size = x.shape[axis]
    target = -(-size // multiple) * multiple
    if target == size:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, target - size)
    return jnp.pad(x, widths)


def _ring_matmul_local(a_loc: jax.Array, b_loc: jax.Array, axis: str, n: int):
    """Per-shard body: a_loc (m/n, k) x ring-rotating b_loc (k/n, c)."""
    my = lax.axis_index(axis)
    rows_loc, k = a_loc.shape
    blk = k // n
    perm = [(i, (i - 1) % n) for i in range(n)]

    def body(s, carry):
        b_cur, acc = carry
        j = ((my + s) % n).astype(jnp.int32)
        zero = jnp.zeros((), jnp.int32)
        a_blk = lax.dynamic_slice(a_loc, (zero, j * blk), (rows_loc, blk))
        acc = acc + jnp.dot(
            a_blk, b_cur, precision="highest",
            preferred_element_type=acc.dtype,
        )
        b_next = lax.ppermute(b_cur, axis, perm)
        return (b_next, acc)

    acc0 = jnp.zeros((rows_loc, b_loc.shape[1]), dtype=jnp.result_type(a_loc, b_loc))
    if hasattr(lax, "pcast"):
        # Mark the all-zeros init as device-varying so the scan carry types
        # match (the accumulated value differs per shard).
        acc0 = lax.pcast(acc0, (axis,), to="varying")
    elif hasattr(lax, "pvary"):
        acc0 = lax.pvary(acc0, (axis,))
    _, out = lax.fori_loop(0, n, body, (b_loc, acc0))
    return out


def ring_matmul(
    a: jax.Array,
    b: jax.Array,
    mesh: Optional[Mesh] = None,
) -> jax.Array:
    """Dense distributed ``a @ b`` with ring-rotated B blocks.

    ``a`` is (m, k), ``b`` is (k, c); both are padded so m and k divide the
    mesh size.  Returns the (m, c) product (padding trimmed).
    """
    mesh = mesh or row_mesh()
    (axis,) = mesh.axis_names
    n = mesh.devices.size
    m, k = a.shape
    c = b.shape[1]

    ap = pad_to_multiple(a, 0, n)
    ap = pad_to_multiple(ap, 1, n)
    bp = pad_to_multiple(b, 0, n)

    fn = shard_map(
        functools.partial(_ring_matmul_local, axis=axis, n=n),
        mesh=mesh,
        in_specs=(P(axis, None), P(axis, None)),
        out_specs=P(axis, None),
    )
    out = fn(ap, bp)
    return out[:m, :c]


@functools.lru_cache(maxsize=None)
def _spgemm_dist_jit(mesh: Mesh, symmetric: bool):
    @jax.jit
    def fn(a: CSRMatrix, b: CSRMatrix):
        cd = ring_matmul(a.todense(), b.todense(), mesh)
        if symmetric:
            cd = jnp.triu(cd)
        return cd

    return fn


def spgemm_dense_distributed(
    a: CSRMatrix,
    b: CSRMatrix,
    symmetric: bool = False,
    mesh: Optional[Mesh] = None,
) -> jax.Array:
    """sparse x sparse -> dense across the whole mesh (row-sharded output)."""
    mesh = mesh or row_mesh()
    return _spgemm_dist_jit(mesh, symmetric)(a, b)


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class ShardedCSR:
    """Row-sharded packed-CSR product: per-shard CSR chunks on device.

    The multi-chip analogue of the reference orchestrators' per-thread
    partial matrices *before* the serial stitch
    (``/root/reference/src/sparse_sparse_sparse.cpp:90-128``): each device
    holds the packed CSR of its own contiguous row block.  ``to_scipy``
    performs the stitch on host via the native C++ runtime.

    * ``indptrs``  -- (n_shards, rows_per_shard + 1) int32, local row ptrs.
    * ``indices``/``values`` -- (n_shards, shard_capacity), padded.
    * ``shape``    -- logical global shape (static).
    """

    indptrs: jax.Array
    indices: jax.Array
    values: jax.Array
    shape: tuple

    def tree_flatten(self):
        return (self.indptrs, self.indices, self.values), (self.shape,)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, shape=aux[0])

    @property
    def n_shards(self) -> int:
        return int(self.indptrs.shape[0])

    def to_scipy(self):
        """Gather the shards and stitch into one scipy CSR on host."""
        import scipy.sparse as sp

        from ..utils.native import stitch_csr

        m, ncols = self.shape
        rows_per = self.indptrs.shape[1] - 1
        # One bulk transfer per array; all trimming on host (device-side
        # data-dependent slices would recompile per distinct nnz).
        indptrs = np.asarray(self.indptrs)
        indices = np.asarray(self.indices)
        values = np.asarray(self.values)
        chunks = []
        row0 = 0
        for s in range(self.n_shards):
            if row0 >= m:
                break
            rows_here = min(rows_per, m - row0)
            ip = indptrs[s][: rows_here + 1]
            nnz = int(ip[-1])
            chunks.append(
                sp.csr_matrix(
                    (values[s][:nnz], indices[s][:nnz], ip),
                    shape=(rows_here, ncols),
                )
            )
            row0 += rows_here
        return stitch_csr(chunks, m, ncols)


def spgemm_csr_distributed(
    a: CSRMatrix,
    b: CSRMatrix,
    shard_capacity: int | None = None,
    symmetric: bool = False,
    mesh: Optional[Mesh] = None,
) -> ShardedCSR:
    """sparse x sparse -> row-sharded packed CSR across the mesh.

    The ring product leaves C row-sharded; each device then extracts its own
    row block to packed CSR *locally* (no cross-chip traffic), the
    distributed replacement for the reference's count->allocate->stitch
    pipeline.  ``shard_capacity`` is the static per-shard entry budget
    (default: the dense row-block size, always sufficient).
    """
    mesh = mesh or row_mesh()
    (axis,) = mesh.axis_names
    n = mesh.devices.size
    m = a.shape[0]
    ncols = b.shape[1]
    mp = -(-m // n) * n
    rows_loc = mp // n
    cap_l = int(shard_capacity) if shard_capacity is not None else rows_loc * ncols

    cd = spgemm_dense_distributed(a, b, symmetric=symmetric, mesh=mesh)
    cd = pad_to_multiple(cd, 0, n)

    def local_extract(c_loc):
        csr = dense_to_csr(c_loc, cap_l)
        return (
            csr.indptr[None, :],
            csr.indices[None, :],
            csr.values[None, :],
        )

    fn = shard_map(
        local_extract,
        mesh=mesh,
        in_specs=P(axis, None),
        out_specs=(P(axis, None), P(axis, None), P(axis, None)),
    )
    ip, ix, vals = fn(cd)
    return ShardedCSR(indptrs=ip, indices=ix, values=vals, shape=(m, ncols))


def triple_product_distributed(
    h: CSRMatrix,
    q: CSRMatrix,
    compute_full_matrix: int = 0,
    mesh: Optional[Mesh] = None,
) -> jax.Array:
    """Fused distributed ``H . Q . H^T``.

    Both contractions run as ring matmuls; the intermediate ``T = H.Q`` stays
    row-sharded on the chips that produced it (never gathered), mirroring the
    reference's "never materialize H.Q as a sparse matrix" contract
    (``/root/reference/src/sparse_sparse_dense.cpp:141-249``).
    """
    mesh = mesh or row_mesh()
    hd = h.todense()
    qd = q.todense()
    t = ring_matmul(hd, qd, mesh)
    c = ring_matmul(t, hd.T, mesh)
    upper = jnp.triu(c)
    if compute_full_matrix:
        return upper + jnp.triu(c, 1).T
    return upper
