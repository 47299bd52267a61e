"""Block-sparse row (BSR) container: the MXU-granular sparse format.

The reference's CSR Gustavson kernels (``/root/reference/src/sparsework.cpp``)
scatter scalar-by-scalar -- the worst possible access pattern for a TPU.  The
TPU-native equivalent of "exploit sparsity in the inner loop" is **block**
sparsity at MXU tile granularity: a matrix is a grid of ``b x b`` blocks
(b = 128 by default, the systolic array edge), only nonzero blocks are stored,
and the SpGEMM kernel (:mod:`sparse_matrix_mult_tpu.ops.pallas.bsr_spgemm`)
skips zero blocks entirely -- no load, no FLOPs.

Storage (a pytree, jit-composable; the block count is a static capacity like
:class:`~sparse_matrix_mult_tpu.types.CSRMatrix`'s entry capacity):

* ``indptr``  -- (nbr + 1,) int32, block-row pointers.
* ``indices`` -- (block_capacity,) int32, block-column ids (padding: 0).
* ``blocks``  -- (block_capacity, b, b) values (padding: zero blocks).
* ``shape``   -- logical (rows, cols); static.

Rows/cols are padded up to multiples of ``b`` logically; padding rows/columns
are zero and never materialize entries.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .types import INDEX_DTYPE, bucket_capacity, row_ids_from_indptr

__all__ = ["BSRMatrix", "bsr_from_scipy", "bsr_to_dense", "bsr_from_dense"]


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class BSRMatrix:
    indptr: jax.Array  # (nbr + 1,) int32
    indices: jax.Array  # (bcap,) int32
    blocks: jax.Array  # (bcap, b, b)
    shape: Tuple[int, int]  # static logical shape

    def tree_flatten(self):
        return (self.indptr, self.indices, self.blocks), (self.shape,)

    @classmethod
    def tree_unflatten(cls, aux, children):
        indptr, indices, blocks = children
        return cls(*children, shape=aux[0])

    @property
    def block_size(self) -> int:
        return int(self.blocks.shape[1])

    @property
    def block_capacity(self) -> int:
        return int(self.blocks.shape[0])

    @property
    def nbr(self) -> int:
        return int(self.indptr.shape[0]) - 1

    @property
    def nbc(self) -> int:
        b = self.block_size
        return -(-self.shape[1] // b)

    @property
    def nblocks(self) -> jax.Array:
        return self.indptr[-1]

    @property
    def dtype(self):
        return self.blocks.dtype

    def block_rows(self) -> jax.Array:
        """Block-row id of every stored block (padding -> nbr, the dummy row
        used by the kernel so padding never touches real output); marker
        trick, not searchsorted (types.row_ids_from_indptr)."""
        cap = self.block_capacity
        pos = jnp.arange(cap, dtype=INDEX_DTYPE)
        rid = row_ids_from_indptr(self.indptr, cap)
        return jnp.where(pos < self.nblocks, rid, self.nbr).astype(INDEX_DTYPE)

    def block_until_ready(self) -> "BSRMatrix":
        jax.block_until_ready((self.indptr, self.indices, self.blocks))
        return self


def _tobsr_padded(mat, block_size: int):
    """scipy matrix -> scipy BSR with the logical shape padded to block
    multiples and sorted block indices.  Shared by :func:`bsr_from_scipy`
    and the BSR x BSR pair planner so block SLOT ids always line up."""
    import scipy.sparse as sp

    if not sp.issparse(mat):
        mat = sp.csr_matrix(np.asarray(mat))
    rows, cols = map(int, mat.shape)
    b = int(block_size)
    if rows % b == 0 and cols % b == 0:
        bs = mat.tobsr(blocksize=(b, b))
    else:
        rp, cp = -(-rows // b) * b, -(-cols // b) * b
        coo = mat.tocoo()
        mat = sp.csr_matrix((coo.data, (coo.row, coo.col)), shape=(rp, cp))
        bs = mat.tobsr(blocksize=(b, b))
    bs.sort_indices()
    return bs


def bsr_from_scipy(
    mat, block_size: int = 128, dtype=None, block_capacity=None, padded_bsr=None
):
    """Host ingestion: any scipy sparse matrix -> device BSRMatrix.

    ``padded_bsr``: a matching :func:`_tobsr_padded` result the caller
    already built (the BSR routing path builds one for its pair planner;
    the O(nnz) conversion should not run twice)."""
    import scipy.sparse as sp

    if not sp.issparse(mat):
        mat = sp.csr_matrix(np.asarray(mat))
    rows, cols = map(int, mat.shape)
    b = int(block_size)
    bs = padded_bsr if padded_bsr is not None else _tobsr_padded(mat, b)
    nblocks = int(bs.indptr[-1])
    cap = block_capacity if block_capacity is not None else max(1, bucket_capacity(nblocks, minimum=1))
    if cap < nblocks:
        raise ValueError(f"block_capacity {cap} < nblocks {nblocks}")
    if dtype is None:
        dtype = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
    indices = np.zeros(cap, np.int32)
    blocks = np.zeros((cap, b, b), np.dtype(dtype))
    indices[:nblocks] = bs.indices
    blocks[:nblocks] = bs.data
    return BSRMatrix(
        indptr=jnp.asarray(bs.indptr, dtype=INDEX_DTYPE),
        indices=jnp.asarray(indices),
        blocks=jnp.asarray(blocks),
        shape=(rows, cols),
    )


def bsr_from_dense(dense: jax.Array, block_capacity: int, block_size: int = 128):
    """Device-side dense -> BSR (jit-composable; static block capacity)."""
    rows, cols = dense.shape
    b = int(block_size)
    nbr, nbc = -(-rows // b), -(-cols // b)
    rp, cp = nbr * b, nbc * b
    if (rp, cp) != (rows, cols):
        dense = jnp.pad(dense, ((0, rp - rows), (0, cp - cols)))
    tiles = dense.reshape(nbr, b, nbc, b).transpose(0, 2, 1, 3)  # (nbr, nbc, b, b)
    mask = jnp.any(tiles != 0, axis=(2, 3))  # (nbr, nbc)

    counts = jnp.sum(mask, axis=1, dtype=INDEX_DTYPE)
    indptr = jnp.concatenate(
        [jnp.zeros(1, INDEX_DTYPE), jnp.cumsum(counts, dtype=INDEX_DTYPE)]
    )
    flat = mask.reshape(-1)
    (pos,) = jnp.nonzero(flat, size=block_capacity, fill_value=nbr * nbc)
    valid = pos < nbr * nbc
    safe = jnp.where(valid, pos, 0)
    bcol = jnp.where(valid, (safe % nbc).astype(INDEX_DTYPE), 0)
    blocks = tiles.reshape(nbr * nbc, b, b)[safe]
    blocks = jnp.where(valid[:, None, None], blocks, 0)
    return BSRMatrix(indptr=indptr, indices=bcol, blocks=blocks, shape=(rows, cols))


def bsr_to_dense(a: BSRMatrix) -> jax.Array:
    """Dense (rows, cols) from BSR via scatter-add of blocks."""
    b = a.block_size
    nbr, nbc = a.nbr, a.nbc
    rid = a.block_rows()
    valid = jnp.arange(a.block_capacity, dtype=INDEX_DTYPE) < a.nblocks
    safe_rid = jnp.where(valid, rid, 0)
    out = jnp.zeros((nbr, nbc, b, b), a.dtype)
    out = out.at[safe_rid, a.indices].add(
        jnp.where(valid[:, None, None], a.blocks, 0)
    )
    dense = out.transpose(0, 2, 1, 3).reshape(nbr * b, nbc * b)
    return dense[: a.shape[0], : a.shape[1]]
