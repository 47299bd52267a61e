import time, json, functools
import numpy as np, scipy.sparse as sp
import jax, jax.numpy as jnp
exec(open("/root/repo/.x3_test.py").read().split("import sparse_matrix_mult_tpu")[0])

import sparse_matrix_mult_tpu as smm
from sparse_matrix_mult_tpu.ops.convert import csr_to_dense
from sparse_matrix_mult_tpu.ops.pallas.triu_matmul import matmul_triu

N = 10_000
a_sp = sp.random(N, N, density=0.1, format="csr", random_state=1)
b_sp = sp.random(N, N, density=0.1, format="csr", random_state=2)
ad = jax.block_until_ready(jax.jit(lambda a: csr_to_dense(a, jnp.float32))(smm.from_scipy(a_sp, dtype=jnp.float32)))
bd = jax.block_until_ready(jax.jit(lambda a: csr_to_dense(a, jnp.float32))(smm.from_scipy(b_sp, dtype=jnp.float32)))

def timeit(f, *args, iters=3):
    float(f(*args)); ts = []
    for _ in range(iters):
        t0 = time.perf_counter(); float(f(*args)); ts.append(time.perf_counter() - t0)
    return min(ts)

t6_512 = timeit(jax.jit(lambda x, y: jnp.sum(jnp.triu(matmul_triu(x, y, tile=512)))), ad, bd)
t6_512k1024 = timeit(jax.jit(lambda x, y: jnp.sum(jnp.triu(matmul_triu(x, y, tile=512, kblock=1024)))), ad, bd)
t3_512k1024 = timeit(jax.jit(lambda x, y: jnp.sum(jnp.triu(matmul_triu_x3(x, y, tile=512, kblock=1024)))), ad, bd)

# accuracy at 10k: f64 oracle via scipy (sparse product then dense triu)
ref = np.triu((a_sp @ b_sp).toarray())
c3 = np.asarray(jax.jit(lambda x, y: jnp.triu(matmul_triu_x3(x, y, tile=512)))(ad, bd), np.float64)
c6 = np.asarray(jax.jit(lambda x, y: jnp.triu(matmul_triu(x, y, tile=512)))(ad, bd), np.float64)
den = np.abs(ref) + 1e-30
print(json.dumps({
    "t_x6_t512": round(t6_512, 4), "t_x6_t512_k1024": round(t6_512k1024, 4),
    "t_x3_t512_k1024": round(t3_512k1024, 4),
    "err_x3_10k": float(np.max(np.abs(c3 - ref) / den)),
    "err_x6_10k": float(np.max(np.abs(c6 - ref) / den)),
    "ok3_10k": bool(np.allclose(c3, ref, rtol=1e-5, atol=1e-8)),
    "ok6_10k": bool(np.allclose(c6, ref, rtol=1e-5, atol=1e-8)),
}))
