import time, json
import numpy as np, scipy.sparse as sp
import jax, jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import sparse_matrix_mult_tpu as smm
from sparse_matrix_mult_tpu.ops.convert import dense_to_csr, csr_to_dense
from sparse_matrix_mult_tpu.ops.pallas.triu_matmul import matmul_triu

N = 10_000
a_sp = sp.random(N, N, density=0.1, format="csr", random_state=1)
b_sp = sp.random(N, N, density=0.1, format="csr", random_state=2)
a = smm.from_scipy(a_sp, dtype=jnp.float32)
b = smm.from_scipy(b_sp, dtype=jnp.float32)
jax.block_until_ready((a.values, b.values))
cap = smm.bucket_capacity((N * N + N) // 2)

f_sum = jax.jit(lambda x: jnp.sum(x))
f_dens = jax.jit(lambda a: csr_to_dense(a, jnp.float32))
f_dens_s = jax.jit(lambda a: jnp.sum(csr_to_dense(a, jnp.float32)))
f_mm_s = jax.jit(lambda ad, bd: jnp.sum(jnp.triu(matmul_triu(ad, bd))))
f_mmf_s = jax.jit(lambda ad, bd: jnp.sum(jnp.dot(ad, bd, precision="highest")))
def _x3(ad, bd):
    alg = jax.lax.DotAlgorithmPreset.BF16_BF16_F32_X3
    return jnp.sum(jnp.triu(jax.lax.dot_general(ad, bd, (((1,), (0,)), ((), ())), precision=alg)))
f_mmx3_s = jax.jit(_x3)
def _ext_s(c):
    csr = dense_to_csr(c, cap)
    return csr.indptr[-1].astype(jnp.float32) + jnp.sum(csr.values)
f_ext_s = jax.jit(_ext_s)

def timeit(f, *args, iters=3):
    float(f(*args))
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        float(f(*args))
        ts.append(time.perf_counter() - t0)
    return min(ts)

t_rtt = timeit(f_sum, jnp.ones(8, jnp.float32))
t_da = timeit(f_dens_s, a)
ad = jax.block_until_ready(f_dens(a))
bd = jax.block_until_ready(f_dens(b))
t_sum100m = timeit(f_sum, ad)
t_mm = timeit(f_mm_s, ad, bd)
t_mmf = timeit(f_mmf_s, ad, bd)
t_mmx3 = timeit(f_mmx3_s, ad, bd)
c = jax.block_until_ready(jax.jit(lambda x, y: jnp.triu(matmul_triu(x, y)))(ad, bd))
t_ext = timeit(f_ext_s, c)
print(json.dumps({
    "rtt": round(t_rtt, 4),
    "sum_100m": round(t_sum100m, 4),
    "densify+sum": round(t_da, 4),
    "matmul_triu+sum": round(t_mm, 4),
    "matmul_full_highest+sum": round(t_mmf, 4),
    "matmul_x3_triu+sum": round(t_mmx3, 4),
    "extract+chk": round(t_ext, 4),
}))
