"""Row-binned 2D ESC: the round-5 hypersparse SpGEMM engine.

The round-4 windowed engine (:func:`.spgemm_jnp.spgemm_esc_windowed`) spends
its time in 1D device-wide passes: two 1D sorts (~5-6 ms each at 2.6M on
v5e), a cummax tail expansion (~8.6 ms) and an indptr ``searchsorted``
(~6 ms).  Measured on v5e (benchmarks/profile_esc_stages*.py, round 5):
a 2D per-row sort of the same volume costs 0.9-1.8 ms -- 3-6x less -- and a
``lax.scan`` stitch of a few hundred lane rows costs 1.5-2.7 ms.  This
engine restructures the whole pipeline around that asymmetry:

1. **Sliced ELLPACK table** (host-planned): every B row is cut into
   ``ceil(len/W)`` width-``W`` slices; a ``(S+1, 1+2W)`` device table
   ``[len | cols | value-bits]`` is built with ONE windowed gather.  Long
   B rows need no tail machinery -- they just own more slices.
2. **Virtual A entries** (host-planned): an A entry whose B row has ``n``
   slices becomes ``n`` virtual entries, laid out in a ``(G, P/W)`` grid
   where each lane row ``g`` holds WHOLE output rows (a contiguous global
   row range).  The expansion is one row gather of the slice table plus
   broadcasts -- no cummax, no scatter.
3. **Lane-local sort/dedup/compact**: partials of an output row never
   leave their lane row, so the (row, col) sort, the shifted-add dedup
   and the compaction sort all run as 2D ``dimension=1`` ops.
4. **Scan stitch**: ``G`` dynamic-update-slices pack the per-lane packed
   runs into the final CSR arrays (forward overwrite of each run's padded
   tail; measured ~4-8 us per lane row).

Replaces the same reference hot loop as the other ESC engines
(``/root/reference/src/sparsework.cpp:56-129``): where the reference
re-partitions rows across OpenMP threads, the host planner here packs rows
into VPU-friendly lanes.  Planning is O(nnz) numpy, done once per operand
STRUCTURE -- the production shape (the reference's motivating inversion
workload holds H and Q structure fixed, ``/root/reference/README.md:140``)
pays it once and reuses the plan across every multiply.
"""

from __future__ import annotations

import dataclasses
import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

from ..types import CSRMatrix, INDEX_DTYPE

__all__ = ["BinnedPlan", "binned_plan", "spgemm_esc_binned"]

# Duplicate (i, k) runs up to 2**_DEDUP_STEPS are summed by the shifted-add
# network; the exact scatter fallback only triggers beyond that.  Deeper
# than the 1D engines' 3 steps: the 2D shifts are cheap fused lane-local
# passes, and denser products routinely carry runs of 10-40 (measured: the
# 2000^2 d=0.02 config tripped the 1-in-a-run>8 cond every call, 88 ms vs
# ~20 ms -- one pathological run must not drag the whole call onto the
# scatter path).
_DEDUP_STEPS = 6
_DEDUP_SPAN = 1 << _DEDUP_STEPS


@dataclasses.dataclass(frozen=True)
class BinnedPlan:
    """Host-side structure plan for :func:`spgemm_esc_binned`.

    All arrays are numpy (uploaded implicitly at call time, or pre-place
    them with ``jnp.asarray`` once for repeated products):

    * ``slice_start``/``slice_len`` -- (S+1,) int32 positions into B's
      entry arrays; slice ``S`` is a dummy empty slice for dead slots.
    * ``va_slice``/``va_entry``/``va_row`` -- (G, P/W) int32 virtual-entry
      grid: slice id, A entry index, global output row (dead slots point
      at the dummy slice).
    * ``window`` (W), ``lane_width`` (P) -- static tile parameters.
    * ``n_partials`` -- exact live partial-product count (for capacity
      sizing); ``padded`` = G * P total slots.
    """

    slice_start: np.ndarray
    slice_len: np.ndarray
    va_slice: np.ndarray
    va_entry: np.ndarray
    va_row: np.ndarray
    window: int
    lane_width: int
    n_partials: int

    @property
    def padded(self) -> int:
        return self.va_slice.shape[0] * self.va_slice.shape[1] * self.window


def binned_plan(
    a_indptr,
    a_indices,
    b_indptr,
    *,
    window: int = 8,
    lane_width: int = 4096,
    max_pad_ratio: float = 3.0,
):
    """Build a :class:`BinnedPlan` for ``A @ B`` from host CSR structure.

    Returns ``None`` when the layout degenerates: a single output row's
    padded volume exceeds one lane (``lane_width``), or total padding
    exceeds ``max_pad_ratio`` x the exact expansion (callers then fall
    back to the windowed/classic engines).  O(nnz(A) + nnz(B)) numpy.
    """
    W = int(window)
    P = int(lane_width)
    Wp = P // W
    a_indptr = np.asarray(a_indptr, np.int64)
    a_indices = np.asarray(a_indices, np.int64)
    b_indptr = np.asarray(b_indptr, np.int64)
    n_rows = len(a_indptr) - 1
    a_nnz = int(a_indptr[-1])

    b_len = np.diff(b_indptr)
    nsl = -(-b_len // W)  # slices per B row
    S = int(nsl.sum())
    scum = np.concatenate([[0], np.cumsum(nsl)])

    # Virtual-entry counts per A entry / per output row.
    per_entry = nsl[a_indices[:a_nnz]]
    ecum = np.concatenate([[0], np.cumsum(per_entry)])
    V = int(ecum[-1])
    n_partials = int((b_len[a_indices[:a_nnz]]).sum())
    if V == 0 or n_partials == 0:
        return None
    vrow_cum = ecum[a_indptr]  # (n_rows+1,) virtual entries before each row
    vcnt = np.diff(vrow_cum)
    if int(vcnt.max()) > Wp:
        return None  # a single output row overflows one lane
    # Contiguous-row first-fit binning: close the lane when the next row
    # would overflow P padded slots.  Rows stay in global order, so the
    # stitched output is row-major CSR with no extra permutation.
    r0 = [0]
    cur = 0
    for r in range(n_rows):
        c = int(vcnt[r])
        if cur + c > Wp:
            r0.append(r)
            cur = 0
        cur += c
    r0.append(n_rows)
    r0 = np.asarray(r0, np.int64)
    G = len(r0) - 1
    if G * P > max_pad_ratio * max(n_partials, 1) + P:
        return None

    # Slice table: position/length of every B-row slice.
    srow = np.repeat(np.arange(len(b_len)), nsl)
    within = np.arange(S) - scum[srow]
    slice_start = np.concatenate(
        [(b_indptr[srow] + within * W), [0]]
    ).astype(np.int32)
    slice_len = np.concatenate(
        [np.minimum(b_len[srow] - within * W, W), [0]]
    ).astype(np.int32)

    # Virtual-entry grid, filled by one flat scatter (rows are contiguous
    # per bin, so a bin's virtual entries are the contiguous id range
    # [vrow_cum[r0[g]], vrow_cum[r0[g+1]]) laid at the bin's slot base).
    ve_entry = np.repeat(np.arange(a_nnz), per_entry)
    ve_within = np.arange(V) - ecum[ve_entry]
    ve_slice = scum[a_indices[ve_entry]] + ve_within
    row_of_entry = np.repeat(np.arange(n_rows), np.diff(a_indptr))
    ve_row = row_of_entry[ve_entry]

    bin_first_ve = vrow_cum[r0]  # (G+1,)
    bin_of_ve = np.searchsorted(bin_first_ve, np.arange(V), side="right") - 1
    slot = np.arange(V) - bin_first_ve[bin_of_ve]
    flat = bin_of_ve * Wp + slot

    va_slice = np.full(G * Wp, S, np.int32)
    va_entry = np.zeros(G * Wp, np.int32)
    va_row = np.zeros(G * Wp, np.int32)
    va_slice[flat] = ve_slice
    va_entry[flat] = ve_entry
    va_row[flat] = ve_row
    return BinnedPlan(
        slice_start=slice_start,
        slice_len=slice_len,
        va_slice=va_slice.reshape(G, Wp),
        va_entry=va_entry.reshape(G, Wp),
        va_row=va_row.reshape(G, Wp),
        window=W,
        lane_width=P,
        n_partials=n_partials,
    )


def _indptr_from_sorted_rows(rows_out, slot_live, n_rows: int):
    row_sorted = jnp.where(slot_live, rows_out, n_rows)
    return jnp.searchsorted(
        row_sorted, jnp.arange(n_rows + 1, dtype=INDEX_DTYPE), side="left"
    ).astype(INDEX_DTYPE)


@functools.partial(
    jax.jit,
    static_argnames=("window", "out_capacity", "symmetric"),
)
def spgemm_esc_binned(
    a: CSRMatrix,
    b: CSRMatrix,
    slice_start: jax.Array,
    slice_len: jax.Array,
    va_slice: jax.Array,
    va_entry: jax.Array,
    va_row: jax.Array,
    *,
    window: int,
    out_capacity: int,
    symmetric: bool = False,
    row_offset=0,
) -> CSRMatrix:
    """``C = A @ B`` via the row-binned 2D ESC pipeline (see module doc).

    The plan arrays come from :func:`binned_plan` built against the SAME
    host structure the device operands were uploaded from (entry order
    must match; ``from_scipy`` preserves it).  ``va_row`` carries LOCAL
    row ids when A is a row chunk; ``row_offset`` keeps the symmetric
    filter globally correct, as in the other ESC engines.
    """
    rows, _ = a.shape
    _, cols = b.shape
    W = int(window)
    G, Wp = va_slice.shape
    P = Wp * W
    big = jnp.array(jnp.iinfo(jnp.int32).max, jnp.int32)
    off = jnp.asarray(row_offset, INDEX_DTYPE)
    fused = rows * cols < 2**31

    wr = jnp.arange(W, dtype=INDEX_DTYPE)
    cap_b = max(b.capacity - 1, 0)
    pos = jnp.clip(slice_start[:, None] + wr[None, :], 0, cap_b)
    f32 = a.values.dtype == jnp.float32 and b.values.dtype == jnp.float32
    if f32:
        b_pack = jnp.stack(
            [b.indices, lax.bitcast_convert_type(b.values, jnp.int32)], axis=1
        )
        ell = b_pack[pos]  # (S+1, W, 2)
        tbl = jnp.concatenate(
            [slice_len[:, None], ell[:, :, 0], ell[:, :, 1]], axis=1
        )
        ga = tbl[va_slice.reshape(-1)].reshape(G, Wp, 1 + 2 * W)
        ln = ga[:, :, 0]
        k2 = ga[:, :, 1 : 1 + W]
        bv = lax.bitcast_convert_type(ga[:, :, 1 + W :], jnp.float32)
    else:
        ell_k = b.indices[pos]  # (S+1, W)
        ell_v = b.values[pos]
        vs = va_slice.reshape(-1)
        ln = slice_len[vs].reshape(G, Wp)
        k2 = ell_k[vs].reshape(G, Wp, W)
        bv = ell_v[vs].reshape(G, Wp, W)
    av = a.values[va_entry]  # (G, Wp) gather at virtual-entry scale
    v2 = av[..., None] * bv
    i2 = jnp.broadcast_to(va_row[..., None], (G, Wp, W)).astype(INDEX_DTYPE)
    valid = wr[None, None, :] < ln[..., None]
    if symmetric:
        valid = valid & (k2 >= i2 + off)
    vals = v2.reshape(G, P)

    if fused:
        keys = jnp.where(valid, i2 * cols + k2, big).reshape(G, P)
        keys_s, vals_s = lax.sort_key_val(keys, vals, dimension=1)
        keyset = (keys_s,)
    else:
        ik = jnp.where(valid, i2, big).reshape(G, P)
        kk = jnp.where(valid, k2, big).reshape(G, P)
        i_s, k_s, vals_s = lax.sort((ik, kk, vals), dimension=1, num_keys=2)
        keyset = (i_s, k_s)

    def same_at(j: int):
        eq = None
        for kkk in keyset:
            e = kkk[:, j:] == kkk[:, :-j]
            eq = e if eq is None else (eq & e)
        return eq

    live = keyset[0] != big
    zcol = jnp.zeros((G, 1), bool)
    prev_same = jnp.concatenate([zcol, same_at(1)], axis=1) if P > 1 else jnp.zeros((G, P), bool)
    boundary = live & ~prev_same

    def fast_tail(vv):
        for j in (1 << s for s in range(_DEDUP_STEPS)):
            if j >= P:
                break
            same = jnp.concatenate(
                [same_at(j), jnp.zeros((G, j), bool)], axis=1
            )
            shifted = jnp.concatenate(
                [vv[:, j:], jnp.zeros((G, j), vv.dtype)], axis=1
            )
            vv = vv + jnp.where(same, shifted, jnp.zeros((), vv.dtype))
        return vv

    def scatter_tail(vv):
        # Exact path for duplicate runs > _DEDUP_SPAN (runs never cross
        # lane rows, so the flattened rank-scatter of the classic engine
        # applies unchanged).
        b_f = boundary.reshape(-1)
        l_f = live.reshape(-1)
        v_f = vv.reshape(-1)
        out_idx = jnp.cumsum(b_f, dtype=INDEX_DTYPE) - 1
        cap = max(G * P, 1)
        safe_idx = jnp.clip(out_idx, 0, cap - 1)
        summed = (
            jnp.zeros(cap, vv.dtype).at[safe_idx].add(jnp.where(l_f, v_f, 0))
        )
        return summed[out_idx].reshape(G, P)

    if P > _DEDUP_SPAN:
        longrun = jnp.any(same_at(_DEDUP_SPAN) & (keyset[0][:, _DEDUP_SPAN:] != big))
        vv = lax.cond(longrun, scatter_tail, fast_tail, vals_s)
    else:
        vv = fast_tail(vals_s)

    # Lane-local compaction: run-first slots to the front of each lane.
    if fused:
        key2 = jnp.where(boundary, keys_s, big)
        key2_s, v2s = lax.sort_key_val(key2, vv, dimension=1)
        packed = (key2_s,)
    else:
        i2c = jnp.where(boundary, i_s, big)
        k2c = jnp.where(boundary, k_s, big)
        i2_s, k2_s, v2s = lax.sort((i2c, k2c, vv), dimension=1, num_keys=2)
        packed = (i2_s, k2_s)
    cnt = jnp.sum(boundary, axis=1, dtype=INDEX_DTYPE)
    offs = jnp.concatenate(
        [jnp.zeros(1, INDEX_DTYPE), jnp.cumsum(cnt, dtype=INDEX_DTYPE)]
    )
    out_nnz = offs[-1]

    # Scan stitch: pack lane runs head-to-tail.  Each DUS writes a full
    # P-wide lane; the dead tail beyond cnt[g] is overwritten by lane
    # g+1's write (offs[g+1] = offs[g] + cnt[g]), and the final tail
    # lands in the +P slack past out_nnz, masked below.
    OC = int(out_capacity)
    bufs0 = tuple(jnp.full(OC + P, big, jnp.int32) for _ in packed) + (
        jnp.zeros(OC + P, vals.dtype),
    )
    planes = packed + (v2s,)

    def step(carry, xs):
        *lanes, o = xs
        out = tuple(
            lax.dynamic_update_slice(buf, lane, (o,))
            for buf, lane in zip(carry, lanes)
        )
        return out, None

    bufs, _ = lax.scan(step, bufs0, (*planes, offs[:-1]))
    slot = jnp.arange(OC, dtype=INDEX_DTYPE)
    slot_live = slot < out_nnz
    if fused:
        keys_o = jnp.where(slot_live, bufs[0][:OC], 0)
        rows_out = keys_o // cols
        cols_out = keys_o % cols
        vals_o = bufs[1][:OC]
    else:
        rows_out = jnp.where(slot_live, bufs[0][:OC], 0)
        cols_out = jnp.where(slot_live, bufs[1][:OC], 0)
        vals_o = bufs[2][:OC]
    indices = jnp.where(slot_live, cols_out, 0).astype(INDEX_DTYPE)
    values = jnp.where(slot_live, vals_o, 0)
    indptr = _indptr_from_sorted_rows(rows_out, slot_live, rows)
    return CSRMatrix(indptr=indptr, indices=indices, values=values, shape=(rows, cols))
