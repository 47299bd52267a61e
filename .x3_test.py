import time, json, functools
import numpy as np, scipy.sparse as sp
import jax, jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

def _kernel_x3(ti_ref, tj_ref, a_ref, b_ref, o_ref):
    k = pl.program_id(1)
    @pl.when(k == 0)
    def _():
        o_ref[...] = jnp.zeros_like(o_ref)
    a = a_ref[...]
    b = b_ref[...]
    ahi = a.astype(jnp.bfloat16)
    alo = (a - ahi.astype(jnp.float32)).astype(jnp.bfloat16)
    bhi = b.astype(jnp.bfloat16)
    blo = (b - bhi.astype(jnp.float32)).astype(jnp.bfloat16)
    dn = (((1,), (0,)), ((), ()))
    dot = lambda x, y: lax.dot_general(x, y, dn, preferred_element_type=jnp.float32)
    o_ref[...] += dot(ahi, bhi) + (dot(ahi, blo) + dot(alo, bhi))

@functools.partial(jax.jit, static_argnames=("tile", "kblock"))
def matmul_triu_x3(a, b, tile=256, kblock=512):
    M, K = a.shape
    N = b.shape[1]
    T, KB = int(tile), min(int(kblock), max(128, K))
    Mp, Np, Kp = -(-M // T) * T, -(-N // T) * T, -(-K // KB) * KB
    if (Mp, Kp) != (M, K):
        a = jnp.pad(a, ((0, Mp - M), (0, Kp - K)))
    if (Kp, Np) != b.shape:
        b = jnp.pad(b, ((0, Kp - K), (0, Np - N)))
    nti, ntj, nk = Mp // T, Np // T, Kp // KB
    pairs = [(i, j) for i in range(nti) for j in range(ntj) if j >= i]
    ti = jnp.asarray(np.array([p[0] for p in pairs], np.int32))
    tj = jnp.asarray(np.array([p[1] for p in pairs], np.int32))
    gs = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2, grid=(len(pairs), nk),
        in_specs=[pl.BlockSpec((T, KB), lambda p, k, ti, tj: (ti[p], k)),
                  pl.BlockSpec((KB, T), lambda p, k, ti, tj: (k, tj[p]))],
        out_specs=pl.BlockSpec((T, T), lambda p, k, ti, tj: (ti[p], tj[p])))
    with jax.enable_x64(False):
        out = pl.pallas_call(_kernel_x3, grid_spec=gs,
            out_shape=jax.ShapeDtypeStruct((Mp, Np), a.dtype))(ti, tj, a, b)
    return out[:M, :N]

import sparse_matrix_mult_tpu as smm
from sparse_matrix_mult_tpu.ops.convert import csr_to_dense
from sparse_matrix_mult_tpu.ops.pallas.triu_matmul import matmul_triu

# ---- accuracy at N=4000, d=0.1 vs f64 oracle ----
N = 4000
a_sp = sp.random(N, N, density=0.1, format="csr", random_state=1)
b_sp = sp.random(N, N, density=0.1, format="csr", random_state=2)
ref = np.triu((a_sp @ b_sp).toarray())
ad = jax.block_until_ready(jax.jit(lambda a: csr_to_dense(a, jnp.float32))(smm.from_scipy(a_sp, dtype=jnp.float32)))
bd = jax.block_until_ready(jax.jit(lambda a: csr_to_dense(a, jnp.float32))(smm.from_scipy(b_sp, dtype=jnp.float32)))
c6 = np.asarray(jax.jit(lambda x, y: jnp.triu(matmul_triu(x, y)))(ad, bd), np.float64)
c3 = np.asarray(jax.jit(lambda x, y: jnp.triu(matmul_triu_x3(x, y)))(ad, bd), np.float64)
den = np.abs(ref) + 1e-30
err6 = np.max(np.abs(c6 - ref) / den)
err3 = np.max(np.abs(c3 - ref) / den)
ok6 = np.allclose(c6, ref, rtol=1e-5, atol=1e-8)
ok3 = np.allclose(c3, ref, rtol=1e-5, atol=1e-8)

# ---- timing at N=10000 ----
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
t6 = timeit(jax.jit(lambda x, y: jnp.sum(jnp.triu(matmul_triu(x, y)))), ad, bd)
t3 = timeit(jax.jit(lambda x, y: jnp.sum(jnp.triu(matmul_triu_x3(x, y)))), ad, bd)
t3b = timeit(jax.jit(lambda x, y: jnp.sum(jnp.triu(matmul_triu_x3(x, y, tile=512)))), ad, bd)
print(json.dumps({"err_x6": float(err6), "err_x3": float(err3), "ok6": bool(ok6), "ok3": bool(ok3),
                  "t_x6_10k": round(t6, 4), "t_x3_10k": round(t3, 4), "t_x3_t512": round(t3b, 4)}))
