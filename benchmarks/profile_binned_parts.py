"""Honest (args-passed, no closure constants) pricing of binned-ESC parts.

The round-5b lesson: closing device arrays over a jitted timing lambda
lets XLA treat them as compile-time constants, which can change lowering
(and fold whole stages); every number here passes ALL tensors as jit
arguments, matching how the engine runs in production.

Run: env PYTHONPATH="/root/repo:/root/.axon_site" python benchmarks/profile_binned_parts.py
"""

import os
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get(
        "SMM_TPU_CACHE_DIR",
        os.path.join(os.path.dirname(__file__), "..", ".jax_cache"),
    ),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import sparse_matrix_mult_tpu as smm
from sparse_matrix_mult_tpu.types import INDEX_DTYPE
from sparse_matrix_mult_tpu.ops.spgemm_binned import binned_plan
from sparse_matrix_mult_tpu.utils.testing import hypersparse_random
from sparse_matrix_mult_tpu.utils.transfer import fine_capacity

K = 5


def timeit(name, fn, *args):
    f1 = jax.jit(lambda *a: lax.fori_loop(0, 1, lambda t, c: fn(c, *a), jnp.float32(0)))
    fK = jax.jit(lambda *a: lax.fori_loop(0, K, lambda t, c: fn(c, *a), jnp.float32(0)))
    float(f1(*args)); float(fK(*args))
    t1s, tKs = [], []
    for _ in range(3):
        t0 = time.perf_counter(); float(f1(*args)); t1s.append(time.perf_counter() - t0)
        t0 = time.perf_counter(); float(fK(*args)); tKs.append(time.perf_counter() - t0)
    per = (min(tKs) - min(t1s)) / (K - 1)
    print(f"{name:44s} {per*1e3:8.2f} ms", flush=True)
    return per


def main():
    n, density = 40_000, 2e-4
    P, W = 4096, 8
    A = hypersparse_random(n, n, int(density * n * n), seed=11)
    B = hypersparse_random(n, n, int(density * n * n), seed=12)
    a = smm.from_scipy(A, dtype=jnp.float32, capacity=fine_capacity(A.nnz)).block_until_ready()
    b = smm.from_scipy(B, dtype=jnp.float32, capacity=fine_capacity(B.nnz)).block_until_ready()
    plan = binned_plan(A.indptr, A.indices, B.indptr, window=W, lane_width=P)
    G, Wp = plan.va_start.shape
    cols = n
    slice_start, slice_len, va_slice, va_entry, va_row, row_lane = plan.device_args()
    va_start = jnp.asarray(plan.va_start)
    # round-5a two-level plan arrays rebuilt on host for comparison
    b_len = np.diff(B.indptr)
    nsl = -(-b_len // W)
    S = int(nsl.sum())
    scum = np.concatenate([[0], np.cumsum(nsl)])
    srow = np.repeat(np.arange(len(b_len)), nsl)
    within = np.arange(S) - scum[srow]
    slice_start = jnp.asarray(np.concatenate(
        [(B.indptr[srow] + within * W), [0]]).astype(np.int32))
    slice_len = jnp.asarray(np.concatenate(
        [np.minimum(b_len[srow] - within * W, W), [0]]).astype(np.int32))
    # va_slice: invert va_start/len to slice ids is awkward; rebuild from scratch
    a_indptr = np.asarray(A.indptr, np.int64); a_indices = np.asarray(A.indices, np.int64)
    a_nnz = int(a_indptr[-1])
    per_entry = nsl[a_indices[:a_nnz]]
    ecum = np.concatenate([[0], np.cumsum(per_entry)])
    V = int(ecum[-1])
    ve_entry = np.repeat(np.arange(a_nnz), per_entry)
    ve_within = np.arange(V) - ecum[ve_entry]
    ve_slice = scum[a_indices[ve_entry]] + ve_within
    vrow_cum = ecum[a_indptr]
    n_rows = len(a_indptr) - 1
    # recompute r0 identically to the planner
    vcnt = np.diff(vrow_cum)
    r0 = [0]; cur = 0
    for r in range(n_rows):
        c = int(vcnt[r])
        if cur + c > Wp:
            r0.append(r); cur = 0
        cur += c
    r0.append(n_rows)
    r0 = np.asarray(r0, np.int64)
    bin_first_ve = vrow_cum[r0]
    bin_of_ve = np.searchsorted(bin_first_ve, np.arange(V), side="right") - 1
    slot = np.arange(V) - bin_first_ve[bin_of_ve]
    flat = bin_of_ve * Wp + slot
    va_slice_np = np.full(G * Wp, S, np.int32)
    va_slice_np[flat] = ve_slice
    va_slice = jnp.asarray(va_slice_np.reshape(G, Wp))

    for x in (va_start, va_entry, va_row, row_lane, slice_start, slice_len, va_slice):
        x.block_until_ready()
    big = jnp.array(jnp.iinfo(jnp.int32).max, jnp.int32)
    wr = jnp.arange(W, dtype=INDEX_DTYPE)
    cap_b = max(b.capacity - 1, 0)

    def mkpack(b_):
        return jnp.concatenate(
            [jnp.stack([b_.indices, lax.bitcast_convert_type(b_.values, jnp.int32)], axis=1),
             jnp.zeros((W, 2), jnp.int32)], axis=0)

    # G1: lax.gather block gather (W,2), CLIP
    def g1(carry, b_, vs):
        bp = mkpack(b_)
        dn = lax.GatherDimensionNumbers(
            offset_dims=(1, 2), collapsed_slice_dims=(), start_index_map=(0,))
        ga = lax.gather(bp, vs.reshape(-1, 1), dn, slice_sizes=(W, 2),
                        mode=lax.GatherScatterMode.CLIP).reshape(G, Wp, W, 2)
        return carry + ga[0, 0, 0, 0].astype(jnp.float32) + ga.sum(dtype=jnp.float32) * 0

    # G1b: same but via vmapped dynamic_slice
    def g1b(carry, b_, vs):
        bp = mkpack(b_)
        def one(s):
            return lax.dynamic_slice(bp, (s, jnp.int32(0)), (W, 2))
        ga = jax.vmap(one)(vs.reshape(-1)).reshape(G, Wp, W, 2)
        return carry + ga[0, 0, 0, 0].astype(jnp.float32) + ga.sum(dtype=jnp.float32) * 0

    # G2: element gather bp[pos]
    def g2(carry, b_, vs):
        bp = mkpack(b_)
        pos = jnp.clip(vs[..., None] + wr[None, None, :], 0, cap_b)
        ga = bp[pos]
        return carry + ga[0, 0, 0, 0].astype(jnp.float32) + ga.sum(dtype=jnp.float32) * 0

    # G3: two-level (round-5a): slice table then 17-col row gather
    def g3(carry, b_, ss, sl, vsl):
        bp = mkpack(b_)[:-W]
        pos = jnp.clip(ss[:, None] + wr[None, :], 0, cap_b)
        ell = bp[pos]
        tbl = jnp.concatenate([sl[:, None], ell[:, :, 0], ell[:, :, 1]], axis=1)
        ga = tbl[vsl.reshape(-1)].reshape(G, Wp, 1 + 2 * W)
        return carry + ga[0, 0, 0].astype(jnp.float32) + ga.sum(dtype=jnp.float32) * 0

    timeit("G1 block lax.gather (W,2)", g1, b, va_start)
    timeit("G1b vmapped dynamic_slice", g1b, b, va_start)
    timeit("G2 element gather", g2, b, va_start)
    timeit("G3 two-level (r5a)", g3, b, slice_start, slice_len, va_slice)

    # S: indptr strategies over a runtime compact-sorted plane
    rng = np.random.default_rng(0)
    fake_rows = np.sort(rng.integers(0, n, size=G * P).astype(np.int32).reshape(G, P), axis=1)
    fake_keys = jnp.asarray(np.sort(
        rng.integers(0, n, size=(G, P)).astype(np.int64) * n
        + rng.integers(0, n, size=(G, P)), axis=1).astype(np.int64)).astype(jnp.int32)
    # build a plausible sorted-per-lane int32 key plane instead
    fk = np.sort((fake_rows.astype(np.int64) * n + rng.integers(0, n, size=(G, P))), axis=1)
    fk = jnp.asarray((fk % (2**31)).astype(np.int32))
    fk.block_until_ready()

    def s1(carry, plane, rl):
        lane = rl.astype(INDEX_DTYPE)
        base = lane * P
        q = jnp.arange(n, dtype=INDEX_DTYPE) * cols
        flat_keys = plane.reshape(-1) + carry.astype(jnp.int32) * 0
        lo = jnp.zeros(n, INDEX_DTYPE)
        step = 1
        while step < P:
            step <<= 1
        while step >= 1:
            probe = lo + step
            idx = jnp.clip(base + probe - 1, 0, G * P - 1)
            kv = flat_keys[idx]
            lo = jnp.where((probe <= P) & (kv < q), probe, lo)
            step >>= 1
        return carry + lo.sum(dtype=jnp.float32) * 1e-9

    OC = fine_capacity(plan.n_partials)
    fake_flat = jnp.asarray(
        np.sort(rng.integers(0, n, size=OC)).astype(np.int32))
    fake_flat.block_until_ready()

    def s2(carry, rows_sorted):
        rs = rows_sorted + carry.astype(jnp.int32) * 0
        indptr = jnp.searchsorted(
            rs, jnp.arange(n + 1, dtype=INDEX_DTYPE), side="left")
        return carry + indptr.sum(dtype=jnp.float32) * 1e-9

    timeit("S1 lane binary-search indptr", s1, fk, row_lane)
    timeit("S2 searchsorted indptr (OC)", s2, fake_flat)

    # D: dedup depth on a runtime sorted plane
    fv = jnp.asarray(rng.standard_normal((G, P)).astype(np.float32))
    fv.block_until_ready()

    def mk_dedup(steps):
        def d(carry, keys_s, vals_s):
            vv = vals_s + carry * 0
            j = 1
            cnt = 0
            while j < P and cnt < steps:
                same = jnp.concatenate(
                    [keys_s[:, j:] == keys_s[:, :-j], jnp.zeros((G, j), bool)], axis=1)
                shifted = jnp.concatenate([vv[:, j:], jnp.zeros((G, j), vv.dtype)], axis=1)
                vv = vv + jnp.where(same, shifted, jnp.zeros((), vv.dtype))
                j <<= 1
                cnt += 1
            return carry + vv.sum(dtype=jnp.float32) * 1e-9
        return d

    timeit("D1 dedup 6 steps", mk_dedup(6), fk, fv)
    timeit("D2 dedup 12 steps", mk_dedup(12), fk, fv)


if __name__ == "__main__":
    main()
