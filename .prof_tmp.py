import time
import numpy as np
import scipy.sparse as sp
import jax, jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import sparse_matrix_mult_tpu as smm
from sparse_matrix_mult_tpu.ops.convert import csr_to_dense, dense_to_csr, dense_to_csr_triu
from sparse_matrix_mult_tpu.ops.dense_path import spgemm_dense_out, product_dense
from sparse_matrix_mult_tpu.ops.pallas.triu_matmul import matmul_triu
from sparse_matrix_mult_tpu.ops.pallas import convert_kernels as ck

def timeit(name, fn, *args, iters=3):
    try:
        chk = fn(*args)
        float(chk)
    except Exception as e:
        print(f"{name}: FAILED {str(e)[:140]}", flush=True)
        return
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        float(fn(*args))
        ts.append(time.perf_counter() - t0)
    print(f"{name}: {min(ts)*1000:.2f} ms", flush=True)

rtt = jax.jit(lambda x: x + 1.0)
timeit("rtt_floor", rtt, jnp.float32(1.0))

for (N, d) in [(2000, 0.05), (1000, 0.01)]:
    a_sp = sp.random(N, N, density=d, format="csr", random_state=1)
    b_sp = sp.random(N, N, density=d, format="csr", random_state=2)
    a = smm.from_scipy(a_sp, dtype=jnp.float32).block_until_ready()
    b = smm.from_scipy(b_sp, dtype=jnp.float32).block_until_ready()
    cap = smm.bucket_capacity(min(N * N, 1 << 26))
    print(f"--- {N}x{N} d={d}", flush=True)
    timeit("densify", jax.jit(lambda a: jnp.sum(csr_to_dense(a, jnp.float32))), a)
    timeit("prod_nosym", jax.jit(lambda a, b: jnp.sum(spgemm_dense_out(a, b))), a, b)
    timeit("prod_sym(triukrn)", jax.jit(lambda a, b: jnp.sum(spgemm_dense_out(a, b, symmetric=True))), a, b)
    timeit("prod_sym(xla)", jax.jit(lambda a, b: jnp.sum(jnp.triu(product_dense(a, b, "fast")))), a, b)
    c = jax.jit(lambda a, b: spgemm_dense_out(a, b, symmetric=True))(a, b)
    jax.block_until_ready(c)
    timeit("extract_full", jax.jit(lambda c: dense_to_csr(c, cap).values.sum()), c)
    timeit("extract_triu", jax.jit(lambda c: dense_to_csr_triu(c, cap).values.sum()), c)
    def chk_full(c):
        csr = dense_to_csr(c, cap)
        return csr.indptr[-1].astype(jnp.float32) + jnp.sum(csr.values)
    def chk_triu(c):
        csr = dense_to_csr_triu(c, cap)
        return csr.indptr[-1].astype(jnp.float32) + jnp.sum(csr.values)
    timeit("extract_full+indptr", jax.jit(chk_full), c)
    timeit("extract_triu+indptr", jax.jit(chk_triu), c)
timeit("rtt_floor(end)", rtt, jnp.float32(2.0))
