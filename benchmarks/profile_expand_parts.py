"""Price the binned-ESC expand sub-stages honestly (args-passed).

Run: env PYTHONPATH="/root/repo:/root/.axon_site" python benchmarks/profile_expand_parts.py [n]
"""

import os
import sys
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
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 40_000
    P, W = 4096, 8
    A = hypersparse_random(n, n, 8 * n, seed=11)
    B = hypersparse_random(n, n, 8 * n, seed=12)
    a = smm.from_scipy(A, dtype=jnp.float32, capacity=fine_capacity(A.nnz)).block_until_ready()
    b = smm.from_scipy(B, dtype=jnp.float32, capacity=fine_capacity(B.nnz)).block_until_ready()
    plan = binned_plan(A.indptr, A.indices, B.indptr, window=W, lane_width=P)
    G, Wp = plan.va_slice.shape
    cols = n
    slice_start, va_slice, va_len, va_entry, va_row, row_lane = plan.device_args()
    S1 = int(plan.slice_start.shape[0])
    for x in (slice_start, va_slice, va_len, va_entry, va_row):
        x.block_until_ready()
    big = jnp.array(jnp.iinfo(jnp.int32).max, jnp.int32)
    wr = jnp.arange(W, dtype=INDEX_DTYPE)
    nblk = -(-b.capacity // W) + 1
    pad = nblk * W - b.capacity
    print(f"n={n} G={G} Wp={Wp} S={S1-1} V~{G*Wp}")

    def table(b_, ss):
        q = ss // W
        r = ss - q * W
        pq = jnp.stack([q, q + 1], axis=1)

        def pair_select(pair, r_):
            out = jnp.zeros((pair.shape[0], W), pair.dtype)
            for s in range(W):
                out = out + jnp.where(
                    (r_ == s)[:, None], pair[:, s : s + W], jnp.zeros((), pair.dtype)
                )
            return out

        bi = jnp.concatenate([b_.indices, jnp.zeros(pad, INDEX_DTYPE)])
        bvb = jnp.concatenate(
            [lax.bitcast_convert_type(b_.values, jnp.int32), jnp.zeros(pad, jnp.int32)]
        )
        blocks = jnp.concatenate([bi.reshape(nblk, W), bvb.reshape(nblk, W)], axis=1)
        gp = blocks[jnp.clip(pq, 0, nblk - 1)]
        tbl_c = pair_select(jnp.concatenate([gp[:, 0, :W], gp[:, 1, :W]], axis=1), r)
        tbl_v = pair_select(jnp.concatenate([gp[:, 0, W:], gp[:, 1, W:]], axis=1), r)
        return tbl_c, tbl_v

    def e_tbl(carry, a_, b_, ss, vsl, ve):
        tc, tv = table(b_, ss)
        tc = tc + carry.astype(jnp.int32) * 0
        return carry + tc.sum(dtype=jnp.float32) * 1e-9 + tv.sum(dtype=jnp.float32) * 1e-9

    def e_va16(carry, a_, b_, ss, vsl, ve):
        tc, tv = table(b_, ss)
        tc = tc + carry.astype(jnp.int32) * 0
        tbl = jnp.concatenate([tc, tv], axis=1)
        ga = tbl[vsl.reshape(-1)].reshape(G, Wp, 2 * W)
        return carry + ga.sum(dtype=jnp.float32) * 1e-9

    def e_va8x2(carry, a_, b_, ss, vsl, ve):
        tc, tv = table(b_, ss)
        tc = tc + carry.astype(jnp.int32) * 0
        vs = vsl.reshape(-1)
        gc = tc[vs].reshape(G, Wp, W)
        gv = tv[vs].reshape(G, Wp, W)
        return carry + gc.sum(dtype=jnp.float32) * 1e-9 + gv.sum(dtype=jnp.float32) * 1e-9

    def e_av(carry, a_, b_, ss, vsl, ve):
        av = (a_.values.at[0].add(carry * 0))[ve]
        return carry + av.sum(dtype=jnp.float32) * 1e-9

    def e_av2(carry, a_, b_, ss, vsl, ve):
        a_pack = jnp.stack([a_.values.at[0].add(carry * 0), a_.values], axis=1)
        av = a_pack[ve][..., 0]
        return carry + av.sum(dtype=jnp.float32) * 1e-9

    def e_vpu(carry, a_, b_, ss, vsl, ve):
        tc, tv = table(b_, ss)
        tc = tc + carry.astype(jnp.int32) * 0
        tbl = jnp.concatenate([tc, tv], axis=1)
        ga = tbl[vsl.reshape(-1)].reshape(G, Wp, 2 * W)
        k2 = ga[:, :, :W]
        bv = lax.bitcast_convert_type(ga[:, :, W:], jnp.float32)
        av = (a_.values.at[0].add(carry * 0))[ve]
        v2 = av[..., None] * bv
        i2 = jnp.broadcast_to(va_row[..., None], (G, Wp, W)).astype(INDEX_DTYPE)
        valid = wr[None, None, :] < va_len[..., None]
        vals = v2.reshape(G, P)
        keys = jnp.where(valid, i2 * cols + k2, big).reshape(G, P)
        return carry + vals[0, 0] + keys.sum(dtype=jnp.float32) * 1e-12

    timeit("table only", e_tbl, a, b, slice_start, va_slice, va_entry)
    timeit("table + va 16-wide gather", e_va16, a, b, slice_start, va_slice, va_entry)
    timeit("table + va 2x8-wide gathers", e_va8x2, a, b, slice_start, va_slice, va_entry)
    timeit("av gather only", e_av, a, b, slice_start, va_slice, va_entry)
    timeit("av (N,2) row gather", e_av2, a, b, slice_start, va_slice, va_entry)
    timeit("full expand (16-wide)", e_vpu, a, b, slice_start, va_slice, va_entry)


if __name__ == "__main__":
    main()
