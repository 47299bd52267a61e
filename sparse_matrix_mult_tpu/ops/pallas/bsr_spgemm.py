"""Pallas BSR SpGEMM: block-granular Gustavson on the MXU.

TPU-native replacement for the reference's scalar Gustavson workers
(``/root/reference/src/sparsework.cpp:12-300``): the unit of sparsity is a
``b x b`` MXU tile instead of a scalar, the "sparse accumulator" work array
(``sparsework.cpp:45``) becomes the C output tile resident in VMEM across a
block-row's accumulation run, and zero blocks are skipped entirely -- no
load, no FLOPs (the reference's `if value != 0` at scalar level,
``sparse_sparse_dense.cpp:113``, lifted to tile level).

Kernel layout:

* grid = (C column tiles, A-block slots).  For a fixed column tile ``j`` the
  kernel walks A's nonzero blocks in block-row order (scalar-prefetched
  ``brow``/``bcol`` tables drive the index maps); consecutive blocks of the
  same block-row accumulate into the same VMEM C tile, which Pallas flushes
  to HBM when the block-row advances.
* Padding slots (t >= nblocks) map to a dummy extra output block-row that is
  sliced off afterwards, so revisiting never corrupts real output.
* Empty block-rows are never visited; the wrapper masks their C rows to
  zero (the kernel's output buffer is undefined there).

Crossover guidance: at block occupancy ``occ`` the kernel moves
``occ * 4 n^3 / b`` bytes of B versus the dense path's ~3 full passes, so it
wins below roughly ``occ < 0.3`` at b=128 -- block-structured or banded
operands -- while random-uniform d>=0.01 sparsity saturates every block and
belongs on the dense MXU path (see SURVEY.md section 6).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...types import INDEX_DTYPE
from ...types_bsr import BSRMatrix

__all__ = ["bsr_matmul_dense"]


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _kernel(brow_ref, bcol_ref, first_ref, blocks_ref, bt_ref, out_ref, *, TN):
    t = pl.program_id(1)

    @pl.when(first_ref[t] == 1)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    a_blk = blocks_ref[0]
    # precision='highest' = 6-pass bf16 on the MXU, matching the dense
    # path's f32 accuracy (plain jnp.dot in a kernel is single-pass bf16).
    out_ref[...] += jnp.dot(
        a_blk,
        bt_ref[...],
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=out_ref.dtype,
    )


@functools.partial(jax.jit, static_argnames=("tile_n",))
def bsr_matmul_dense(a: BSRMatrix, b_dense: jax.Array, tile_n: int = 512):
    """``A_bsr @ B_dense -> dense`` with zero blocks skipped.

    ``b_dense`` is (K, N) with K >= a.shape[1]; result is (a.shape[0], N).
    """
    bs = a.block_size
    nbr = a.nbr
    bcap = a.block_capacity
    K, N = b_dense.shape

    TN = min(int(tile_n), max(128, N))
    Np = -(-N // TN) * TN
    Kp = -(-K // bs) * bs
    if (Kp, Np) != (K, N):
        b_dense = jnp.pad(b_dense, ((0, Kp - K), (0, Np - N)))
    nj = Np // TN

    brow = a.block_rows()  # padding -> nbr (dummy row)
    bcol = jnp.where(
        jnp.arange(bcap, dtype=INDEX_DTYPE) < a.nblocks, a.indices, 0
    )
    prev = jnp.concatenate([jnp.full(1, -1, INDEX_DTYPE), brow[:-1]])
    first = (brow != prev).astype(INDEX_DTYPE)

    kern = functools.partial(_kernel, TN=TN)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(nj, bcap),
        in_specs=[
            pl.BlockSpec((1, bs, bs), lambda j, t, br, bc, f: (t, 0, 0)),
            pl.BlockSpec((bs, TN), lambda j, t, br, bc, f: (bc[t], j)),
        ],
        out_specs=pl.BlockSpec((bs, TN), lambda j, t, br, bc, f: (br[t], j)),
    )
    with jax.enable_x64(False):
        out = pl.pallas_call(
            kern,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct(((nbr + 1) * bs, Np), b_dense.dtype),
            interpret=_interpret(),
        )(brow, bcol, first, a.blocks, b_dense)

    out = out[: a.shape[0], :N]
    # Block-rows with no stored blocks were never visited; their output is
    # undefined. Mask them to zero.
    row_blocks = a.indptr[1:] - a.indptr[:-1]  # (nbr,)
    row_has = jnp.repeat(row_blocks > 0, bs, total_repeat_length=nbr * bs)
    return jnp.where(row_has[: a.shape[0], None], out, 0)
