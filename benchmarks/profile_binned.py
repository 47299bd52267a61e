"""Device-resident binned-ESC timing at the hypersparse configs (round 5).

Run: env PYTHONPATH="/root/repo:/root/.axon_site" python benchmarks/profile_binned.py [P ...]
"""

import os
import sys
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
from sparse_matrix_mult_tpu.ops.spgemm_binned import binned_plan, spgemm_esc_binned
from sparse_matrix_mult_tpu.utils.testing import hypersparse_random
from sparse_matrix_mult_tpu.utils.transfer import fine_capacity

K = 5


def main():
    lanes = [int(x) for x in sys.argv[1:]] or [4096, 8192]
    windows = [int(x) for x in os.environ.get("SMM_WINDOWS", "8").split(",")]
    import json
    cfgs = json.loads(os.environ.get("SMM_CONFIGS", "[[40000, 2e-4], [100000, 1e-4]]"))
    for n, density in cfgs:
        n = int(n)
        A = hypersparse_random(n, n, int(density * n * n), seed=11)
        B = hypersparse_random(n, n, int(density * n * n), seed=12)
        nnz_c = int((A @ B).nnz)
        a = smm.from_scipy(A, dtype=jnp.float32, capacity=fine_capacity(A.nnz)).block_until_ready()
        b = smm.from_scipy(B, dtype=jnp.float32, capacity=fine_capacity(B.nnz)).block_until_ready()
        OC = fine_capacity(nnz_c)
        for P in lanes:
          for W in windows:
            plan = binned_plan(A.indptr, A.indices, B.indptr, window=W, lane_width=P)
            if plan is None:
                print(f"n={n} P={P} W={W}: no plan", flush=True)
                continue
            G, Wp = plan.va_start.shape
            args = list(plan.device_args())
            for x in args:
                x.block_until_ready()

            def run(a_, b_, *pargs, kk):
                def body(t, carry):
                    a2 = dc.replace(a_, values=a_.values.at[0].add(carry * 0))
                    c = spgemm_esc_binned(
                        a2, b_, *pargs, window=plan.window, out_capacity=OC, dedup_span=plan.max_run
                    )
                    return c.values[0] + c.indptr[-1].astype(jnp.float32) * 1e-6
                return lax.fori_loop(0, kk, body, jnp.float32(0))

            f1 = jax.jit(lambda a_, b_, *p: run(a_, b_, *p, kk=1))
            fK = jax.jit(lambda a_, b_, *p: run(a_, b_, *p, kk=K))
            float(f1(a, b, *args)); float(fK(a, b, *args))
            t1s, tKs = [], []
            for _ in range(3):
                t0 = time.perf_counter(); float(f1(a, b, *args)); t1s.append(time.perf_counter() - t0)
                t0 = time.perf_counter(); float(fK(a, b, *args)); tKs.append(time.perf_counter() - t0)
            per = (min(tKs) - min(t1s)) / (K - 1)
            mps = plan.n_partials / per / 1e6
            print(
                f"n={n} P={P} W={W} G={G} padded={plan.padded} exact={plan.n_partials} "
                f"per-iter {per*1e3:.2f} ms = {mps:.1f} M partials/s",
                flush=True,
            )


if __name__ == "__main__":
    main()
