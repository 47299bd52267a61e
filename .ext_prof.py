import time, json
import numpy as np, scipy.sparse as sp
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
import sparse_matrix_mult_tpu as smm
from sparse_matrix_mult_tpu.ops.convert import csr_to_dense
from sparse_matrix_mult_tpu.ops.pallas.convert_kernels import _run_concentrate, dense_to_csr_staged
from sparse_matrix_mult_tpu.ops.pallas.triu_matmul import matmul_triu

N = 10_000
a_sp = sp.random(N, N, density=0.1, format="csr", random_state=1)
b_sp = sp.random(N, N, density=0.1, format="csr", random_state=2)
ad = jax.block_until_ready(jax.jit(lambda a: csr_to_dense(a, jnp.float32))(smm.from_scipy(a_sp, dtype=jnp.float32)))
bd = jax.block_until_ready(jax.jit(lambda a: csr_to_dense(a, jnp.float32))(smm.from_scipy(b_sp, dtype=jnp.float32)))
c = jax.block_until_ready(jax.jit(lambda x, y: jnp.triu(matmul_triu(x, y)))(ad, bd))
cap = smm.bucket_capacity((N*N+N)//2)

def timeit(f, *args, iters=3):
    float(f(*args)); ts = []
    for _ in range(iters):
        t0 = time.perf_counter(); float(f(*args)); ts.append(time.perf_counter() - t0)
    return min(ts)

L, G = 16384, 8
total = N*N
R = -(-total // L)
Rp = -(-R // (G*16)) * (G*16)

def lvl1(c):
    flat = jnp.reshape(c, (-1,))
    flat = jnp.concatenate([flat, jnp.zeros(Rp*L - total, c.dtype)])
    c2d = jnp.reshape(flat, (Rp, L))
    pv, pp, cnt = _run_concentrate(c2d, total, G=G, L=L)
    return jnp.sum(cnt[:, 0]).astype(jnp.float32) + pv[0, 0] + pp[-1, -1].astype(jnp.float32)
t_l1 = timeit(jax.jit(lvl1), c)

# searchsorted cost: 50M sorted i32, 10k+1 edges
pos = jnp.arange(cap, dtype=jnp.int32) * 2
edges = jnp.arange(N+1, dtype=jnp.int32) * N
t_ss = timeit(jax.jit(lambda p, e: jnp.sum(jnp.searchsorted(p, e, side="left").astype(jnp.float32))), pos, edges)

# row-count alternative: one masked reduction over the dense + cumsum
t_rc = timeit(jax.jit(lambda c: jnp.sum(jnp.cumsum(jnp.sum((c != 0).astype(jnp.int32), axis=1)).astype(jnp.float32))), c)

def full(c):
    ip, ix, v = dense_to_csr_staged(c, cap, lane=L, block_rows=G)
    return ip[-1].astype(jnp.float32) + jnp.sum(v) + jnp.sum(ix.astype(jnp.float32))
t_full = timeit(jax.jit(full), c)
print(json.dumps({"lvl1_concentrate": round(t_l1,4), "searchsorted_50m": round(t_ss,4),
                  "rowcount_cumsum": round(t_rc,4), "full_extract": round(t_full,4)}))
