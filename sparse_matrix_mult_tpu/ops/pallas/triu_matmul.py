"""Pallas upper-triangular matmul: C = A @ B^T computed only where j >= i.

The reference's fused triple product emits only the upper triangle of
H.Q.H^T unless ``compute_full_matrix`` is set
(``/root/reference/src/sparse_sparse_dense.cpp:200-216``: the inner loop
starts at ``k = i``).  On TPU the analogous saving is at MXU-tile
granularity: a scalar-prefetched table enumerates only the ``ti <= tj`` tile
pairs, so the strictly-lower tiles are neither loaded nor multiplied --
~2x fewer FLOPs for the (m, n) x (n, m) contraction.  ``jnp.triu`` applied
by the caller zeroes both the sub-diagonal halves of diagonal tiles and the
never-visited lower tiles (whose memory is undefined).

Arithmetic: by default each f32 tile product runs as a **double-bf16 split**
(``a ~= hi + lo`` with both halves bf16) and three full-rate bf16 MXU passes
``hh + hl + lh`` -- the same decomposition XLA's 3-pass f32 emulation uses.
v5e measurements at 10k x 10k (net of link RTT): split3 @ tile 512/kblock
1024 runs ~17 ms vs ~36 ms for ``precision=HIGHEST`` f32 -- 2.1x -- with
max-rel error 2.9e-6 vs the f64 oracle (the dropped ``lo*lo`` term is
bounded by 2^-18 per product), comfortably inside the reference oracle's
rtol=1e-5 (``/root/reference/tests/test_basic.py:54``).  Set
``Config.triu_split3=False`` to fall back to full f32 (HIGHEST) passes.

Used by :func:`sparse_matrix_mult_tpu.ops.triple_product.triple_product_dense`
for the second contraction ``(H.Q) @ H^T``; also exposed directly for any
symmetric product ``A @ A^T``-like use.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["matmul_triu", "matmul_transpose_triu"]

# Tile geometry: 512x1024 blocks measured fastest on v5e at the headline
# size (fewer grid steps than 256x512; fits VMEM with the raised per-kernel
# limit below).
_TILE = 512
_KBLOCK = 1024
_VMEM_LIMIT = 64 * 1024 * 1024


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _split3_ok() -> bool:
    from ...config import get_config

    return get_config().triu_split3


def _kernel(ti_ref, tj_ref, a_ref, b_ref, o_ref, *, contract, split3: bool):
    k = pl.program_id(1)

    @pl.when(k == 0)
    def _():
        o_ref[...] = jnp.zeros_like(o_ref)

    av = a_ref[...]
    bv = b_ref[...]
    dn = (contract, ((), ()))
    if split3 and av.dtype == jnp.float32:
        # Double-bf16 split: 3 full-rate MXU passes; the dropped lo*lo term
        # is <= 2^-18 relative per product.
        ah = av.astype(jnp.bfloat16)
        al = (av - ah.astype(jnp.float32)).astype(jnp.bfloat16)
        bh = bv.astype(jnp.bfloat16)
        bl = (bv - bh.astype(jnp.float32)).astype(jnp.bfloat16)
        kw = dict(
            precision=jax.lax.Precision.DEFAULT,
            preferred_element_type=o_ref.dtype,
        )
        acc = jax.lax.dot_general(ah, bh, dn, **kw)
        acc += jax.lax.dot_general(ah, bl, dn, **kw)
        acc += jax.lax.dot_general(al, bh, dn, **kw)
        o_ref[...] += acc
    else:
        o_ref[...] += jax.lax.dot_general(
            av,
            bv,
            dimension_numbers=dn,
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=o_ref.dtype,
        )


@functools.partial(
    jax.jit, static_argnames=("transpose_b", "tile", "kblock", "split3")
)
def _matmul_triu_impl(
    a: jax.Array,
    b: jax.Array,
    transpose_b: bool,
    tile: int,
    kblock: int,
    split3: bool,
):
    M, K = a.shape
    N = b.shape[0] if transpose_b else b.shape[1]
    T = int(tile)
    KB = min(int(kblock), max(128, K))

    Mp = -(-M // T) * T
    Np = -(-N // T) * T
    Kp = -(-K // KB) * KB
    if (Mp, Kp) != (M, K):
        a = jnp.pad(a, ((0, Mp - M), (0, Kp - K)))
    if transpose_b:
        if (Np, Kp) != b.shape:
            b = jnp.pad(b, ((0, Np - N), (0, Kp - K)))
        b_spec = pl.BlockSpec((T, KB), lambda p, k, ti, tj: (tj[p], k))
        contract = ((1,), (1,))
    else:
        if (Kp, Np) != b.shape:
            b = jnp.pad(b, ((0, Kp - K), (0, Np - N)))
        b_spec = pl.BlockSpec((KB, T), lambda p, k, ti, tj: (k, tj[p]))
        contract = ((1,), (0,))
    nti, ntj, nk = Mp // T, Np // T, Kp // KB

    # Upper tile-pair table (ti <= tj), row-major in ti.
    pairs = [(i, j) for i in range(nti) for j in range(ntj) if j >= i]
    ti_tab = jnp.asarray(np.array([p[0] for p in pairs], np.int32))
    tj_tab = jnp.asarray(np.array([p[1] for p in pairs], np.int32))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(len(pairs), nk),
        in_specs=[
            pl.BlockSpec((T, KB), lambda p, k, ti, tj: (ti[p], k)),
            b_spec,
        ],
        out_specs=pl.BlockSpec((T, T), lambda p, k, ti, tj: (ti[p], tj[p])),
    )
    kern = functools.partial(_kernel, contract=contract, split3=split3)
    with jax.enable_x64(False):
        out = pl.pallas_call(
            kern,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((Mp, Np), a.dtype),
            compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
            interpret=_interpret(),
        )(ti_tab, tj_tab, a, b)
    return out[:M, :N]


def matmul_triu(
    a: jax.Array,
    b: jax.Array,
    transpose_b: bool = False,
    tile: int = _TILE,
    kblock: int = _KBLOCK,
    split3: bool | None = None,
):
    """Upper-tile-only product: ``a @ b`` or ``a @ b.T``.

    ``a`` is (M, K); ``b`` is (K, N) (or (N, K) with ``transpose_b``).  The
    output is logically square; every tile ti > tj is undefined -- callers
    MUST mask (``jnp.triu``).  Entries within diagonal tiles are fully
    computed.  ``split3=None`` reads :attr:`Config.triu_split3`.
    """
    if split3 is None:
        split3 = _split3_ok()
    return _matmul_triu_impl(a, b, transpose_b, tile, kblock, bool(split3))


def matmul_transpose_triu(
    a, b, tile: int = _TILE, kblock: int = _KBLOCK, split3: bool | None = None
):
    """Upper-tile-only ``a @ b.T`` (see :func:`matmul_triu`)."""
    return matmul_triu(a, b, transpose_b=True, tile=tile, kblock=kblock, split3=split3)
