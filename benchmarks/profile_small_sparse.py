"""Small/mid device-resident sparse-output latency (round 5, VERDICT item 2).

Times, on the real chip at 1000^2 d=0.01 (and 2000^2 d=0.02):
  * dense route: MXU product + dense_to_csr extraction (the ~20 ms floor)
  * the extraction alone
  * row-binned ESC engine (sparse route, no dense panel at all)
vs scipy on host.  K-chained dispatches with checksums.

Run: env PYTHONPATH="/root/repo:/root/.axon_site" python benchmarks/profile_small_sparse.py
"""

import os
import time
import dataclasses as dc

import numpy as np
import scipy.sparse as sp

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
from sparse_matrix_mult_tpu.ops.convert import dense_to_csr
from sparse_matrix_mult_tpu.ops.dense_path import spgemm_dense_out
from sparse_matrix_mult_tpu.ops.spgemm_binned import binned_plan, spgemm_esc_binned
from sparse_matrix_mult_tpu.utils.transfer import fine_capacity

K = 8


def timeit(name, make_chk, *args):
    def loop(kk):
        def f(*a):
            def body(t, carry):
                return make_chk(carry, *a)
            return lax.fori_loop(0, kk, body, jnp.float32(0))
        return jax.jit(f)

    f1, fK = loop(1), loop(K)
    float(f1(*args)); float(fK(*args))
    t1s, tKs = [], []
    for _ in range(4):
        t0 = time.perf_counter(); float(f1(*args)); t1s.append(time.perf_counter() - t0)
        t0 = time.perf_counter(); float(fK(*args)); tKs.append(time.perf_counter() - t0)
    per = (min(tKs) - min(t1s)) / (K - 1)
    print(f"{name:32s} {per*1e3:8.2f} ms", flush=True)
    return per


def main():
    for n, d in [(1000, 0.01), (2000, 0.02)]:
        A = sp.random(n, n, density=d, format="csr", random_state=1)
        B = sp.random(n, n, density=d, format="csr", random_state=2)
        c_sp = A @ B
        t0 = time.perf_counter(); _ = A @ B; t_scipy = time.perf_counter() - t0
        print(f"== {n}x{n} d={d}  nnz(C)={c_sp.nnz}  scipy {t_scipy*1e3:.2f} ms", flush=True)
        a = smm.from_scipy(A, dtype=jnp.float32).block_until_ready()
        b = smm.from_scipy(B, dtype=jnp.float32).block_until_ready()
        OC = fine_capacity(int(c_sp.nnz))

        def chk_dense_route(carry, a_, b_):
            a2 = dc.replace(a_, values=a_.values.at[0].add(carry * 0))
            c = spgemm_dense_out(a2, b_)
            csr = dense_to_csr(c, OC)
            return csr.values[0] + csr.indptr[-1].astype(jnp.float32) * 1e-6

        def chk_product_only(carry, a_, b_):
            a2 = dc.replace(a_, values=a_.values.at[0].add(carry * 0))
            c = spgemm_dense_out(a2, b_)
            return jnp.sum(c) * 1e-6

        timeit("dense_product_only", chk_product_only, a, b)
        timeit("dense_route_with_extract", chk_dense_route, a, b)

        plan = binned_plan(A.indptr, A.indices, B.indptr, window=8, lane_width=4096)
        if plan is None:
            print("no binned plan", flush=True)
            continue
        pargs = list(plan.device_args())

        def chk_binned(carry, a_, b_, *p):
            a2 = dc.replace(a_, values=a_.values.at[0].add(carry * 0))
            c = spgemm_esc_binned(a2, b_, *p, window=plan.window, out_capacity=OC, dedup_span=plan.max_run)
            return c.values[0] + c.indptr[-1].astype(jnp.float32) * 1e-6

        timeit(f"binned_esc (G={plan.va_start.shape[0]})", chk_binned, a, b, *pargs)


if __name__ == "__main__":
    main()
