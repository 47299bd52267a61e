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

__all__ = ["bsr_matmul_dense", "bsr_bsr_matmul_dense", "bsr_pair_plan"]


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


# ---------------------------------------------------------------------------
# BSR x BSR: both operands block-sparse; only matching block PAIRS touch the
# MXU.  The tile-level lift of the reference's scalar `if value != 0` on BOTH
# sides of the product (``/root/reference/src/sparse_sparse_dense.cpp:113``):
# where BSR x dense still runs nblocks(A) * nbc(B) tile products, this runs
# exactly |{(i,k) in A, (k,j) in B}| of them -- at 10% occupancy on both
# operands that is ~10x fewer MXU ops and ~10x less B traffic.
# ---------------------------------------------------------------------------


def bsr_pair_plan(a_sp, b_sp, block_size: int, bs_a=None, bs_b=None):
    """Host-side block-pair schedule for ``bsr_bsr_matmul_dense``.

    Walks the two scipy operands' block patterns (same ``tobsr`` + sorted
    indices as ``bsr_from_scipy``, so slot ids line up with the device
    containers) and emits, sorted by output block (ci, cj):

    a dict with ``pa/pb`` (A/B block slots per pair), ``ci/cj`` (output
    block coordinates), ``first`` (run-start flags), ``mask`` (the
    (nbr, nbc) visited-block mask), ``n_pairs``, and ``n_a_blocks``.
    Returns ``None`` for an empty product.
    """
    from ...types_bsr import _tobsr_padded

    if bs_a is None:
        bs_a = _tobsr_padded(a_sp, block_size)
    if bs_b is None:
        bs_b = _tobsr_padded(b_sp, block_size)
    na = int(bs_a.indptr[-1])
    nbr = len(bs_a.indptr) - 1
    nbc = -(-b_sp.shape[1] // block_size)
    if na == 0 or int(bs_b.indptr[-1]) == 0:
        return None
    rows_a = np.repeat(
        np.arange(nbr, dtype=np.int64), np.diff(bs_a.indptr)
    )  # block-row per A slot
    kk = bs_a.indices[:na].astype(np.int64)  # contraction block per A slot
    lens = np.diff(bs_b.indptr)[kk]
    ends = np.cumsum(lens)
    starts = ends - lens
    n_pairs = int(ends[-1])
    if n_pairs == 0:
        return None
    ta = np.repeat(np.arange(na, dtype=np.int64), lens)
    off = np.arange(n_pairs, dtype=np.int64) - np.repeat(starts, lens)
    tb = bs_b.indptr[kk[ta]].astype(np.int64) + off
    ci = rows_a[ta]
    cj = bs_b.indices[tb].astype(np.int64)
    order = np.lexsort((cj, ci))  # stable: runs grouped by output block
    pa, pb, ci, cj = ta[order], tb[order], ci[order], cj[order]
    first = np.ones(n_pairs, np.int32)
    first[1:] = ((ci[1:] != ci[:-1]) | (cj[1:] != cj[:-1])).astype(np.int32)
    mask = np.zeros((nbr, nbc), bool)
    mask[ci, cj] = True
    from ...types import bucket_capacity

    cap = bucket_capacity(n_pairs, minimum=1)
    pad = cap - n_pairs

    def padded(x, fill):
        return np.concatenate([x.astype(np.int32), np.full(pad, fill, np.int32)])

    return dict(
        pa=padded(pa, 0),
        pb=padded(pb, 0),
        ci=padded(ci, nbr),  # padding accumulates into the dummy block-row
        cj=padded(cj, 0),
        first=padded(first, 1),
        mask=mask,
        n_pairs=n_pairs,
        n_a_blocks=na,
    )


def _kernel_bb(pa_ref, pb_ref, ci_ref, cj_ref, first_ref, a_ref, b_ref, out_ref):
    t = pl.program_id(0)

    @pl.when(first_ref[t] == 1)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    out_ref[...] += jnp.dot(
        a_ref[0],
        b_ref[0],
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=out_ref.dtype,
    )


@jax.jit
def bsr_bsr_matmul_dense(a, b, pa, pb, ci, cj, first, mask):
    """``A_bsr @ B_bsr -> dense`` touching only matching block pairs.

    ``pa/pb/ci/cj/first`` come from :func:`bsr_pair_plan` (scalar-prefetched;
    pairs sorted by output block so runs accumulate in one VMEM tile);
    ``mask`` is the (nbr, nbc) visited-block mask -- unvisited C blocks have
    undefined kernel output and are zeroed here.
    """
    bs = a.block_size
    nbr = a.nbr
    nbc = b.nbc
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=(pa.shape[0],),
        in_specs=[
            pl.BlockSpec((1, bs, bs), lambda t, pa, pb, ci, cj, f: (pa[t], 0, 0)),
            pl.BlockSpec((1, bs, bs), lambda t, pa, pb, ci, cj, f: (pb[t], 0, 0)),
        ],
        out_specs=pl.BlockSpec((bs, bs), lambda t, pa, pb, ci, cj, f: (ci[t], cj[t])),
    )
    with jax.enable_x64(False):
        out = pl.pallas_call(
            _kernel_bb,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct(((nbr + 1) * bs, nbc * bs), a.dtype),
            interpret=_interpret(),
        )(pa, pb, ci, cj, first, a.blocks, b.blocks)
    out = out[: nbr * bs]
    # Unvisited C blocks hold uninitialized kernel output (NaN in interpret
    # mode): mask with where, never multiply (NaN * 0 = NaN).
    out = jnp.where(
        mask[:, None, :, None], out.reshape(nbr, bs, nbc, bs), 0
    ).reshape(nbr * bs, nbc * bs)
    return out[: a.shape[0], : b.shape[1]]
