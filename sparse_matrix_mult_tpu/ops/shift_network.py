"""Monotonic shift networks: vectorized scatter/compaction without scatter.

TPUs execute XLA ``scatter``/``gather`` with data-dependent indices close to
serially (measured ~4.4M updates/s on v5e -- 2.3 s to densify a 1e7-nnz CSR
matrix), which makes naive ``.at[].add`` densification and ``jnp.nonzero``
extraction the dominant cost of any sparse pipeline.  This module replaces
both with fully vectorized primitives built only from ``roll`` + ``where`` --
operations the VPU executes at full memory bandwidth.

Every data movement this framework needs is **order-preserving with distinct
destinations** (CSR entries are sorted by (row, col); row compaction keeps
order), so it decomposes into the two classic SIMD routing primitives
(Nassimi & Sahni, "Data Broadcasting in SIMD Computers", IEEE ToC 1981):

* **concentrate** -- move the j-th live element to slot ``rank(j)`` (compact
  to prefix).  Binary-decompose each shift ``s = pos - rank`` and execute one
  masked roll per bit, LSB first.  Collision-free: ranks are what makes the
  shift sequence non-decreasing, and with non-decreasing shifts a transient
  overlap at pass ``b`` would force two equal or order-crossing final
  positions (impossible).
* **distribute** -- inverse of concentrate: move packed prefix element ``p``
  to destination ``d_p`` (strictly increasing).  Run the concentrate network
  time-reversed: MSB-first passes moving right by ``2^b`` when bit ``b`` of
  ``d_p - p`` is set.  Collision-free because each intermediate state is the
  time-reverse of a collision-free concentrate trajectory.

An arbitrary monotone move (e.g. CSR -> ELL, ELL -> packed CSR) is
``concentrate`` then ``distribute``.

This replaces the reference's host-side pointer arithmetic: the Gustavson
workers' packed-output construction (``/root/reference/src/sparsework.cpp:81-148``)
and the orchestrators' prefix-sum + memcpy stitch
(``/root/reference/src/sparse_sparse_sparse.cpp:269-291``) are both "move
contiguous runs to computed offsets" -- exactly what these networks do, in
log2(L) data-parallel passes.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp

__all__ = [
    "concentrate",
    "distribute",
    "monotonic_move_1d",
    "monotonic_move_rows",
    "compact_1d",
    "compact_rows",
    "distribute_1d",
    "distribute_rows",
]

_INT = jnp.int32


def _net(x_tuple, s, nbits: int, axis: int, forward: bool):
    """Shared pass loop.  ``forward=False`` -> concentrate (left moves, LSB
    first); ``forward=True`` -> distribute (right moves, MSB first)."""
    L = s.shape[axis]
    pos = jax.lax.broadcasted_iota(_INT, s.shape, axis)
    bits = range(nbits) if not forward else range(nbits - 1, -1, -1)
    for b in bits:
        d = 1 << b
        if d >= L:
            continue
        if forward:
            sr = jnp.roll(s, d, axis=axis)        # from p - d
            in_range = pos >= d
        else:
            sr = jnp.roll(s, -d, axis=axis)       # from p + d
            in_range = pos < L - d
        arrive = in_range & ((sr & d) != 0)
        leave = (s & d) != 0
        new_x = []
        for x in x_tuple:
            xr = jnp.roll(x, d if forward else -d, axis=axis)
            new_x.append(jnp.where(arrive, xr, jnp.where(leave, 0, x)))
        x_tuple = tuple(new_x)
        s = jnp.where(arrive, sr - d, jnp.where(leave, 0, s))
    return x_tuple


def concentrate(x_tuple, live, axis: int = 0):
    """Compact live elements of each 1D lane to its prefix, preserving order.

    Returns (moved_x_tuple, counts) where counts is the number of live
    elements (summed along ``axis``, keepdims semantics of cumsum[-1]).
    """
    live_i = live.astype(_INT)
    rank = jnp.cumsum(live_i, axis=axis) - 1
    pos = jax.lax.broadcasted_iota(_INT, live.shape, axis)
    s = jnp.where(live, pos - rank, 0)
    xs = tuple(jnp.where(live, x, 0) for x in x_tuple)
    nbits = int(live.shape[axis]).bit_length()
    return _net(xs, s, nbits, axis, forward=False)


def distribute(x_tuple, count, dest_packed, out_len: int, axis: int = 0):
    """Move packed prefix elements p < count to strictly-increasing
    ``dest_packed[p]`` slots of a length-``out_len`` lane."""
    in_len = x_tuple[0].shape[axis]
    L = max(in_len, out_len)

    def pad(a):
        if a.shape[axis] >= L:
            return a
        widths = [(0, 0)] * a.ndim
        widths[axis] = (0, L - a.shape[axis])
        return jnp.pad(a, widths)

    pos = jax.lax.broadcasted_iota(_INT, pad(x_tuple[0]).shape, axis)
    live = pos < count
    dest_p = jnp.where(live, pad(dest_packed).astype(_INT), pos)
    s = jnp.where(live, dest_p - pos, 0)
    xs = tuple(jnp.where(live, pad(x), 0) for x in x_tuple)
    nbits = int(out_len).bit_length()
    moved = _net(xs, s, nbits, axis, forward=True)
    if L == out_len:
        return moved
    index = [slice(None)] * moved[0].ndim
    index[axis] = slice(0, out_len)
    return tuple(m[tuple(index)] for m in moved)


# -- high-level helpers ------------------------------------------------------

def monotonic_move_1d(
    x_tuple: Sequence[jax.Array],
    src_valid: jax.Array,
    dest: jax.Array,
    out_len: int,
) -> Tuple[jax.Array, ...]:
    """Move x[j] (where src_valid[j]) to slot dest[j] of fresh (out_len,)
    arrays.  ``dest`` must be strictly increasing over valid j."""
    carry = tuple(x_tuple) + (dest.astype(_INT),)
    packed = concentrate(carry, src_valid, axis=0)
    dest_packed = packed[-1]
    count = jnp.sum(src_valid.astype(_INT))
    return distribute(packed[:-1], count, dest_packed, out_len, axis=0)


def monotonic_move_rows(
    x_tuple: Sequence[jax.Array],
    src_valid: jax.Array,
    dest: jax.Array,
    out_cols: int,
) -> Tuple[jax.Array, ...]:
    """Row-independent variant along the last axis of 2D arrays."""
    carry = tuple(x_tuple) + (dest.astype(_INT),)
    packed = concentrate(carry, src_valid, axis=1)
    dest_packed = packed[-1]
    count = jnp.sum(src_valid.astype(_INT), axis=1, keepdims=True)
    return distribute(packed[:-1], count, dest_packed, out_cols, axis=1)


def compact_1d(x_tuple, keep, out_len: int):
    """Left-compact kept elements of 1D arrays, preserving order."""
    moved = concentrate(tuple(x_tuple), keep, axis=0)
    if out_len == moved[0].shape[0]:
        return moved
    if out_len < moved[0].shape[0]:
        return tuple(m[:out_len] for m in moved)
    return tuple(jnp.pad(m, (0, out_len - m.shape[0])) for m in moved)


def compact_rows(x_tuple, keep, out_cols: int):
    """Left-compact each row independently (2D, last axis)."""
    moved = concentrate(tuple(x_tuple), keep, axis=1)
    cols = moved[0].shape[1]
    if out_cols == cols:
        return moved
    if out_cols < cols:
        return tuple(m[:, :out_cols] for m in moved)
    return tuple(jnp.pad(m, ((0, 0), (0, out_cols - cols))) for m in moved)


def distribute_1d(x_tuple, count, dest_packed, out_len: int):
    return distribute(tuple(x_tuple), count, dest_packed, out_len, axis=0)


def distribute_rows(x_tuple, counts, dest_packed, out_cols: int):
    """counts: (rows, 1) live-prefix lengths per row."""
    return distribute(tuple(x_tuple), counts, dest_packed, out_cols, axis=1)
