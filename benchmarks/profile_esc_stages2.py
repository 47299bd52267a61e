"""Candidate-op pricing for the row-binned 2D ESC redesign (round 5).

Measures, on the real chip at the 40k hypersparse scale (~2.6M partials):
  * indptr derivation: searchsorted (current) vs scatter-add histogram
  * 2D row sort at (G, P) for P in {4096, 8192}, single and two-tensor
  * scan stitch with dynamic_update_slice, G steps
  * full windowed ESC with tail_capacity=0 (prices the tail machinery)

Run: env PYTHONPATH="/root/repo:/root/.axon_site" python benchmarks/profile_esc_stages2.py
"""

import os
import time
import dataclasses as dc

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
from sparse_matrix_mult_tpu.ops.spgemm_jnp import (
    expansion_size,
    spgemm_esc_windowed,
    windowed_plan,
)
from sparse_matrix_mult_tpu.utils.testing import hypersparse_random
from sparse_matrix_mult_tpu.utils.transfer import fine_capacity

N = 40_000
E = 2_621_440  # ~ the fine expand capacity at the 40k config
K = 5


def timeit(name, fn, *args):
    f1 = jax.jit(lambda *a: lax.fori_loop(0, 1, lambda t, c: fn(*a, c), jnp.float32(0)))
    fK = jax.jit(lambda *a: lax.fori_loop(0, K, lambda t, c: fn(*a, c), jnp.float32(0)))
    float(f1(*args)); float(fK(*args))
    t1s, tKs = [], []
    for _ in range(3):
        t0 = time.perf_counter(); float(f1(*args)); t1s.append(time.perf_counter() - t0)
        t0 = time.perf_counter(); float(fK(*args)); tKs.append(time.perf_counter() - t0)
    per = (min(tKs) - min(t1s)) / (K - 1)
    print(f"{name:34s} {per*1e3:8.2f} ms", flush=True)
    return per


def main():
    rng = np.random.default_rng(0)
    # Sorted fused keys with ~0.1% dups, live fraction ~0.98 like the real run.
    nnz = int(E * 0.975)
    keys_np = np.sort(rng.integers(0, np.int64(N) * N, nnz).astype(np.int64))
    keys_np = keys_np.astype(np.int32) if N * N < 2**31 else keys_np
    # N*N = 1.6e9 < 2^31 -> int32 fused keys fine
    keys_np = np.concatenate([keys_np, np.full(E - nnz, np.iinfo(np.int32).max, np.int32)]).astype(np.int32)
    rows_np = np.where(keys_np != np.iinfo(np.int32).max, keys_np // N, 0).astype(np.int32)
    keys = jnp.asarray(keys_np)
    rows = jnp.asarray(rows_np)
    vals = jnp.asarray(rng.standard_normal(E).astype(np.float32))
    live = keys != jnp.iinfo(jnp.int32).max

    # --- indptr candidates ---------------------------------------------------
    def f_searchsorted(rows_, live_, c):
        row_sorted = jnp.where(live_, rows_ + (c * 0).astype(jnp.int32), N)
        ip = jnp.searchsorted(
            row_sorted, jnp.arange(N + 1, dtype=INDEX_DTYPE), side="left"
        )
        return ip[-1].astype(jnp.float32) * 1e-6 + ip[N // 2].astype(jnp.float32) * 1e-9

    def f_scatter_hist(rows_, live_, c):
        cnts = jnp.zeros(N + 1, INDEX_DTYPE).at[
            jnp.where(live_, rows_ + 1 + (c * 0).astype(jnp.int32), N + 1)
        ].add(1, mode="drop")
        ip = jnp.cumsum(cnts)
        return ip[-1].astype(jnp.float32) * 1e-6 + ip[N // 2].astype(jnp.float32) * 1e-9

    timeit("indptr_searchsorted", f_searchsorted, rows, live)
    timeit("indptr_scatter_hist", f_scatter_hist, rows, live)

    # --- 2D sorts ------------------------------------------------------------
    for P in (4096, 8192, 16384):
        G = E // P
        k2 = jnp.asarray(rng.integers(0, N * N, (G, P)).astype(np.int32))
        v2 = jnp.asarray(rng.standard_normal((G, P)).astype(np.float32))

        def f_sort2d(k_, v_, c):
            ks, vs = lax.sort_key_val(k_ + (c * 0).astype(jnp.int32), v_, dimension=1)
            return vs[0, 0] + ks[-1, -1].astype(jnp.float32) * 1e-9

        timeit(f"sort2d_keyval_P{P}", f_sort2d, k2, v2)

    # 1D reference sort at E
    def f_sort1d(k_, v_, c):
        ks, vs = lax.sort_key_val(k_ + (c * 0).astype(jnp.int32), v_)
        return vs[0] + ks[-1].astype(jnp.float32) * 1e-9

    timeit("sort1d_keyval_E", f_sort1d, keys, vals)

    # --- scan stitch ---------------------------------------------------------
    for P in (4096, 8192):
        G = E // P
        k2 = jnp.asarray(rng.integers(0, N * N, (G, P)).astype(np.int32))
        v2 = jnp.asarray(rng.standard_normal((G, P)).astype(np.float32))
        offs = jnp.asarray((np.arange(G) * (P - 16)).astype(np.int32))

        def f_stitch(k_, v_, offs_, c):
            out_k0 = jnp.full(E + P, jnp.iinfo(jnp.int32).max, jnp.int32)
            out_v0 = jnp.zeros(E + P, jnp.float32)

            def step(carry, xs):
                ok, ov = carry
                kg, vg, off = xs
                ok = lax.dynamic_update_slice(ok, kg + (c * 0).astype(jnp.int32), (off,))
                ov = lax.dynamic_update_slice(ov, vg, (off,))
                return (ok, ov), None

            (ok, ov), _ = lax.scan(step, (out_k0, out_v0), (k_, v_, offs_))
            return ov[0] + ok[-1].astype(jnp.float32) * 1e-9

        timeit(f"scan_stitch_G{G}_P{P}", f_stitch, k2, v2, offs)

    # --- windowed ESC without tail (prices the tail machinery) --------------
    A = hypersparse_random(N, N, int(2e-4 * N * N), seed=11)
    B = hypersparse_random(N, N, int(2e-4 * N * N), seed=12)
    expand = expansion_size(A.indices, A.nnz, B.indptr)
    plan = windowed_plan(A.nnz, np.diff(B.indptr)[A.indices], expand)
    W, tail = plan
    nnz_c = int((A @ B).nnz)
    a = smm.from_scipy(A, dtype=jnp.float32, capacity=fine_capacity(A.nnz)).block_until_ready()
    b = smm.from_scipy(B, dtype=jnp.float32, capacity=fine_capacity(B.nnz)).block_until_ready()
    EC = fine_capacity(expand)
    OC = fine_capacity(nnz_c)

    def f_notail(a_, b_, c):
        a2 = dc.replace(a_, values=a_.values.at[0].add(c * 0))
        out = spgemm_esc_windowed(
            a2, b_, window=W, expand_capacity=EC, tail_capacity=0, out_capacity=OC
        )
        return out.values[0] + out.indptr[-1].astype(jnp.float32) * 1e-6

    timeit("windowed_esc_no_tail", f_notail, a, b)

    TC = fine_capacity(tail)

    def f_tail(a_, b_, c):
        a2 = dc.replace(a_, values=a_.values.at[0].add(c * 0))
        out = spgemm_esc_windowed(
            a2, b_, window=W, expand_capacity=EC, tail_capacity=TC, out_capacity=OC
        )
        return out.values[0] + out.indptr[-1].astype(jnp.float32) * 1e-6

    timeit("windowed_esc_with_tail", f_tail, a, b)


if __name__ == "__main__":
    main()
