import time, json, functools
import numpy as np, scipy.sparse as sp
import jax, jax.numpy as jnp
from jax import lax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
import sparse_matrix_mult_tpu as smm
from sparse_matrix_mult_tpu.ops.convert import csr_to_dense
from sparse_matrix_mult_tpu.ops.pallas.convert_kernels import _run_concentrate
from sparse_matrix_mult_tpu.ops.pallas.triu_matmul import matmul_triu

N = 10_000
a_sp = sp.random(N, N, density=0.1, format="csr", random_state=1)
b_sp = sp.random(N, N, density=0.1, format="csr", random_state=2)
ad = jax.block_until_ready(jax.jit(lambda a: csr_to_dense(a, jnp.float32))(smm.from_scipy(a_sp, dtype=jnp.float32)))
bd = jax.block_until_ready(jax.jit(lambda a: csr_to_dense(a, jnp.float32))(smm.from_scipy(b_sp, dtype=jnp.float32)))
c = jax.block_until_ready(jax.jit(lambda x, y: jnp.triu(matmul_triu(x, y)))(ad, bd))
cap = smm.bucket_capacity((N*N+N)//2)
total = N*N

def timeit(f, *args, iters=3):
    float(f(*args)); ts = []
    for _ in range(iters):
        t0 = time.perf_counter(); float(f(*args)); ts.append(time.perf_counter() - t0)
    return min(ts)

def extract_combined(c, capacity, L, G, Gs):
    m, n = c.shape
    R = -(-total // L)
    R_pad = -(-R // (G*Gs)) * (G*Gs)
    ng2 = R_pad // Gs
    cap_pad = capacity + Gs * L
    flat = jnp.reshape(c, (-1,))
    if R_pad * L != total:
        flat = jnp.concatenate([flat, jnp.zeros(R_pad*L - total, c.dtype)])
    c2d = jnp.reshape(flat, (R_pad, L))
    pv, pp, cnt = _run_concentrate(c2d, total, G=G, L=L)
    flat_counts = cnt[:, 0]
    q = jnp.concatenate([jnp.zeros(1, jnp.int32), jnp.cumsum(flat_counts, dtype=jnp.int32)])
    pvb = lax.bitcast_convert_type(pv, jnp.int32)  # (R_pad, L) i32
    out0 = jnp.zeros((2, cap_pad), jnp.int32)
    def step(out, g):
        r0 = g * Gs
        z = jnp.zeros((), jnp.int32)
        rows_v = lax.dynamic_slice(pvb, (r0, z), (Gs, L))
        rows_p = lax.dynamic_slice(pp, (r0, z), (Gs, L))
        qs = lax.dynamic_slice(q, (r0,), (Gs + 1,))
        base = qs[0]
        chunk = jnp.zeros((2, Gs * L), jnp.int32)
        for r in range(Gs):
            off = qs[r] - base
            vp = jnp.stack([rows_v[r], rows_p[r]])  # (2, L)
            chunk = lax.dynamic_update_slice(chunk, vp, (z, off))
        out = lax.dynamic_update_slice(out, chunk, (z, base))
        return out, None
    out, _ = lax.scan(step, out0, jnp.arange(ng2, dtype=jnp.int32))
    nnz = q[-1]
    slot = jnp.arange(capacity, dtype=jnp.int32)
    live = slot < nnz
    pos = out[1, :capacity]
    values = jnp.where(live, lax.bitcast_convert_type(out[0, :capacity], jnp.float32), 0)
    # indptr via direct row counts (c != 0 per matrix row)
    rc = jnp.sum((c != 0).astype(jnp.int32), axis=1)
    indptr = jnp.concatenate([jnp.zeros(1, jnp.int32), jnp.cumsum(rc, dtype=jnp.int32)])
    indices = jnp.where(live, pos % n, 0).astype(jnp.int32)
    return indptr, indices, values

def run(L, G, Gs):
    f = jax.jit(functools.partial(extract_combined, capacity=cap, L=L, G=G, Gs=Gs))
    def g(c):
        ip, ix, v = f(c)
        return ip[-1].astype(jnp.float32) + jnp.sum(v) + jnp.sum(ix.astype(jnp.float32))
    try:
        t = timeit(jax.jit(g), c)
    except Exception as e:
        return {"t": None, "err": str(e)[:120]}
    ip, ix, v = jax.block_until_ready(f(c))
    # verify vs scipy
    cs = sp.csr_matrix(np.asarray(c, np.float64))
    ok = (np.array_equal(np.asarray(ip), cs.indptr.astype(np.int32))
          and np.array_equal(np.asarray(ix)[:cs.nnz], cs.indices.astype(np.int32))
          and np.allclose(np.asarray(v)[:cs.nnz], cs.data, rtol=1e-6))
    return {"t": round(t, 4), "ok": bool(ok)}

res = {}
res["L16384_G8_Gs16"] = run(16384, 8, 16)
res["L16384_G8_Gs32"] = run(16384, 8, 32)
res["L32768_G2_Gs16"] = run(32768, 2, 16)
print(json.dumps(res))
