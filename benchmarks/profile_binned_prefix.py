"""Honest (args-passed) prefix timing of the binned-ESC pipeline stages.

Mirrors the engine in ops/spgemm_binned.py stage by stage; every tensor
is a jit argument (closure-captured arrays become XLA constants and can
change lowering -- see the module docstring of spgemm_binned).

Run: env PYTHONPATH="/root/repo:/root/.axon_site" python benchmarks/profile_binned_prefix.py [n density]
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
    density = float(sys.argv[2]) if len(sys.argv) > 2 else 8.0 / n
    P, W = 4096, 8
    A = hypersparse_random(n, n, int(density * n * n), seed=11)
    B = hypersparse_random(n, n, int(density * n * n), seed=12)
    nnz_c = int((A @ B).nnz)
    a = smm.from_scipy(A, dtype=jnp.float32, capacity=fine_capacity(A.nnz)).block_until_ready()
    b = smm.from_scipy(B, dtype=jnp.float32, capacity=fine_capacity(B.nnz)).block_until_ready()
    OC = fine_capacity(nnz_c)
    plan = binned_plan(A.indptr, A.indices, B.indptr, window=W, lane_width=P)
    G, Wp = plan.va_slice.shape
    cols = n
    rows = n
    args = list(plan.device_args())
    for x in args:
        x.block_until_ready()
    big = jnp.array(jnp.iinfo(jnp.int32).max, jnp.int32)
    wr = jnp.arange(W, dtype=INDEX_DTYPE)
    print(f"n={n} G={G} padded={plan.padded} exact={plan.n_partials} OC={OC}")
    nblk = -(-b.capacity // W) + 1
    pad = nblk * W - b.capacity

    def pipeline(carry, a_, b_, slice_start, va_slice, va_len, va_entry, va_row, row_lane, upto):
        a_vals = a_.values.at[0].add(carry * 0)
        q = slice_start // W
        r = slice_start - q * W
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
        if upto == -1:
            return carry + gp.sum(dtype=jnp.float32) * 1e-9
        tbl_c = pair_select(jnp.concatenate([gp[:, 0, :W], gp[:, 1, :W]], axis=1), r)
        tbl_v = pair_select(jnp.concatenate([gp[:, 0, W:], gp[:, 1, W:]], axis=1), r)
        tbl = jnp.concatenate([tbl_c, tbl_v], axis=1)
        ga = tbl[va_slice.reshape(-1)].reshape(G, Wp, 2 * W)
        k2 = ga[:, :, :W]
        bv = lax.bitcast_convert_type(ga[:, :, W:], jnp.float32)
        av = a_vals[va_entry]
        v2 = av[..., None] * bv
        i2 = jnp.broadcast_to(va_row[..., None], (G, Wp, W)).astype(INDEX_DTYPE)
        valid = wr[None, None, :] < va_len[..., None]
        vals = v2.reshape(G, P)
        keys = jnp.where(valid, i2 * cols + k2, big).reshape(G, P)
        if upto == 0:
            return carry + vals[0, 0] + keys[0, 0].astype(jnp.float32) * 1e-9
        keys_s, vals_s = lax.sort_key_val(keys, vals, dimension=1)
        if upto == 1:
            return carry + vals_s[0, 0] + keys_s[0, 0].astype(jnp.float32) * 1e-9

        def same_at(j):
            return keys_s[:, j:] == keys_s[:, :-j]

        live = keys_s != big
        prev_same = jnp.concatenate([jnp.zeros((G, 1), bool), same_at(1)], axis=1)
        boundary = live & ~prev_same
        vv = vals_s
        j = 1
        while j < P:
            same = jnp.concatenate([same_at(j), jnp.zeros((G, j), bool)], axis=1)
            shifted = jnp.concatenate([vv[:, j:], jnp.zeros((G, j), vv.dtype)], axis=1)
            vv = vv + jnp.where(same, shifted, jnp.zeros((), vv.dtype))
            j <<= 1
        if upto == 2:
            return carry + vv[0, 0] + boundary[0, 0].astype(jnp.float32)
        key2 = jnp.where(boundary, keys_s, big)
        key2_s, v2s = lax.sort_key_val(key2, vv, dimension=1)
        if upto == 3:
            return carry + v2s[0, 0] + key2_s[0, 0].astype(jnp.float32) * 1e-9
        cnt = jnp.sum(boundary, axis=1, dtype=INDEX_DTYPE)
        offs = jnp.concatenate(
            [jnp.zeros(1, INDEX_DTYPE), jnp.cumsum(cnt, dtype=INDEX_DTYPE)]
        )
        out_nnz = offs[-1]
        lane = row_lane.astype(INDEX_DTYPE)
        base = lane * P
        qq = jnp.arange(rows, dtype=INDEX_DTYPE) * cols
        flat_keys = key2_s.reshape(-1)
        lo = jnp.zeros(rows, INDEX_DTYPE)
        step = 1
        while step < P:
            step <<= 1
        while step >= 1:
            probe = lo + step
            idx = jnp.clip(base + probe - 1, 0, G * P - 1)
            kv = flat_keys[idx]
            lo = jnp.where((probe <= P) & (kv < qq), probe, lo)
            step >>= 1
        indptr = jnp.concatenate([offs[lane] + lo, out_nnz[None]]).astype(INDEX_DTYPE)
        if upto == 4:
            return carry + v2s[0, 0] + indptr[-1].astype(jnp.float32) * 1e-9
        bufs0 = (jnp.full(OC + P, big, jnp.int32), jnp.zeros(OC + P, vals.dtype))

        def step_fn(c2, xs):
            k_l, v_l, o = xs
            return (
                lax.dynamic_update_slice(c2[0], k_l, (o,)),
                lax.dynamic_update_slice(c2[1], v_l, (o,)),
            ), None

        bufs, _ = lax.scan(step_fn, bufs0, (key2_s, v2s, offs[:-1]), unroll=8)
        if upto == 5:
            return carry + bufs[1][0] + indptr[-1].astype(jnp.float32) * 1e-9
        slot = jnp.arange(OC, dtype=INDEX_DTYPE)
        slot_live = slot < out_nnz
        keys_o = jnp.where(slot_live, bufs[0][:OC], 0)
        cols_out = keys_o % cols
        values = jnp.where(slot_live, bufs[1][:OC], 0)
        return carry + values[0] + indptr[-1].astype(jnp.float32) * 1e-9 + cols_out[0].astype(jnp.float32) * 1e-9

    names = {-1: "Pm1 block-pair gather", 0: "P0 expand+keys", 1: "P1 +sort1",
             2: "P2 +dedup12", 3: "P3 +compact", 4: "P4 +offs+binsearch",
             5: "P5 +stitch(unroll8)", 6: "P6 +outputs"}
    for u in (-1, 0, 1, 2, 3, 4, 5, 6):
        timeit(names[u], lambda c, *aa, _u=u: pipeline(c, *aa, _u), a, b, *args)


if __name__ == "__main__":
    main()
