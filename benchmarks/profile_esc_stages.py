"""Per-stage breakdown of the windowed-ESC pipeline on the real chip.

Times cumulative PREFIXES of spgemm_esc_windowed's internal pipeline (each
prefix is one jitted program, K-chained in a fori_loop so the tunnel's
~25 ms dispatch cost is paid once), then differences adjacent prefixes to
attribute time per stage.  Loop-iteration scheduling quantum (~2.5-5 ms)
is hidden for bodies >= the quantum; cheap prefixes read as ~quantum and
the diff column is what matters.

Run: env PYTHONPATH="/root/repo:/root/.axon_site" python benchmarks/profile_esc_stages.py
"""

import json
import os
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
from sparse_matrix_mult_tpu.types import INDEX_DTYPE
from sparse_matrix_mult_tpu.ops.spgemm_jnp import (
    _b_pack,
    _window_table,
    expansion_size,
    spgemm_esc_windowed,
    windowed_plan,
)
from sparse_matrix_mult_tpu.utils.testing import hypersparse_random
from sparse_matrix_mult_tpu.utils.transfer import fine_capacity

N = 40_000
DENSITY = 2e-4
K = 5


def main():
    A = hypersparse_random(N, N, int(DENSITY * N * N), seed=11)
    B = hypersparse_random(N, N, int(DENSITY * N * N), seed=12)
    expand = expansion_size(A.indices, A.nnz, B.indptr)
    plan = windowed_plan(A.nnz, np.diff(B.indptr)[A.indices], expand)
    W, tail = plan
    nnz_c = int((A @ B).nnz)
    a = smm.from_scipy(A, dtype=jnp.float32, capacity=fine_capacity(A.nnz)).block_until_ready()
    b = smm.from_scipy(B, dtype=jnp.float32, capacity=fine_capacity(B.nnz)).block_until_ready()
    EC = fine_capacity(expand)
    OC = fine_capacity(nnz_c)
    TC = fine_capacity(tail) if tail else 0
    cols = N
    big = jnp.array(jnp.iinfo(jnp.int32).max, jnp.int32)
    print(f"# W={W} tail={tail} expand={expand} nnz_c={nnz_c} EC={EC} OC={OC} TC={TC}", flush=True)

    # ---- cumulative prefixes ------------------------------------------------
    def p_table(a_, b_):
        tbl = _window_table(b_, W, _b_pack(b_))
        return jnp.sum(tbl, dtype=jnp.int32).astype(jnp.float32) * 1e-9

    def _expand(a_, b_):
        a_slot = jnp.arange(a_.capacity, dtype=INDEX_DTYPE)
        a_valid = a_slot < a_.nnz
        a_rows = a_.row_ids()
        a_idx_safe = jnp.where(a_valid, a_.indices, 0)
        wr = jnp.arange(W, dtype=INDEX_DTYPE)
        tbl = _window_table(b_, W, _b_pack(b_))
        ga = tbl[a_idx_safe]
        lens = jnp.where(a_valid, ga[:, 0], 0)
        k2 = ga[:, 2 : 2 + W]
        bv = lax.bitcast_convert_type(ga[:, 2 + W :], jnp.float32)
        v2 = a_.values[:, None] * bv
        i2 = jnp.broadcast_to(a_rows[:, None], (a_.capacity, W))
        valid2 = a_valid[:, None] & (wr[None, :] < jnp.minimum(lens, W)[:, None])
        k_p = jnp.where(valid2, i2 * cols + k2, big).reshape(-1)
        v_p = v2.reshape(-1)
        return k_p, v_p

    def p_gather(a_, b_):
        a_slot = jnp.arange(a_.capacity, dtype=INDEX_DTYPE)
        a_valid = a_slot < a_.nnz
        a_idx_safe = jnp.where(a_valid, a_.indices, 0)
        tbl = _window_table(b_, W, _b_pack(b_))
        ga = tbl[a_idx_safe]
        return jnp.sum(ga, dtype=jnp.int32).astype(jnp.float32) * 1e-9

    def p_expand(a_, b_):
        k_p, v_p = _expand(a_, b_)
        return jnp.sum(v_p) * 1e-6 + jnp.sum(k_p, dtype=jnp.int32).astype(jnp.float32) * 1e-9

    def _sorted(a_, b_):
        k_p, v_p = _expand(a_, b_)
        key_sorted, v_sorted = lax.sort_key_val(k_p, v_p)
        live = min(EC, k_p.shape[0])
        return key_sorted[:live], v_sorted[:live]

    def p_sort(a_, b_):
        ks, vs = _sorted(a_, b_)
        return jnp.sum(vs) * 1e-6 + jnp.sum(ks, dtype=jnp.int32).astype(jnp.float32) * 1e-9

    def _dedup(a_, b_):
        ks, vs = _sorted(a_, b_)
        Es = vs.shape[0]
        def same_at(j):
            return ks[j:] == ks[:-j]
        live = ks != big
        prev_same = jnp.concatenate([jnp.zeros(1, bool), same_at(1)])
        boundary = live & ~prev_same
        vv = vs
        for j in (1, 2, 4):
            if j >= Es:
                break
            same = jnp.concatenate([same_at(j), jnp.zeros(j, bool)])
            shifted = jnp.concatenate([vv[j:], jnp.zeros(j, vv.dtype)])
            vv = vv + jnp.where(same, shifted, jnp.zeros((), vv.dtype))
        return ks, vv, boundary

    def p_dedup(a_, b_):
        ks, vv, boundary = _dedup(a_, b_)
        return (
            jnp.sum(vv) * 1e-6
            + jnp.sum(boundary, dtype=jnp.int32).astype(jnp.float32) * 1e-9
        )

    def p_compact(a_, b_):
        ks, vv, boundary = _dedup(a_, b_)
        key2 = jnp.where(boundary, ks, big)
        key2_s, v2 = lax.sort_key_val(key2, vv)
        return jnp.sum(v2[:OC]) * 1e-6 + jnp.sum(key2_s[:OC], dtype=jnp.int32).astype(jnp.float32) * 1e-9

    def p_full(a_, b_):
        c = spgemm_esc_windowed(
            a_, b_, window=W, expand_capacity=EC, tail_capacity=TC, out_capacity=OC
        )
        return c.values[0] + c.indptr[-1].astype(jnp.float32) * 1e-6

    prefixes = [
        ("table", p_table),
        ("gather_a", p_gather),
        ("expand_elem", p_expand),
        ("sort1", p_sort),
        ("dedup", p_dedup),
        ("compact_sort", p_compact),
        ("full", p_full),
    ]

    results = {}
    for name, fn in prefixes:
        def make(kk, fn=fn):
            def loop(a_, b_):
                def body(t, carry):
                    a2 = dc.replace(a_, values=a_.values.at[0].add(carry * 0))
                    return fn(a2, b_)
                return lax.fori_loop(0, kk, body, jnp.float32(0))
            return jax.jit(loop)

        f1, fK = make(1), make(K)
        float(f1(a, b)); float(fK(a, b))  # warm
        t1s, tKs = [], []
        for _ in range(3):
            t0 = time.perf_counter(); float(f1(a, b)); t1s.append(time.perf_counter() - t0)
            t0 = time.perf_counter(); float(fK(a, b)); tKs.append(time.perf_counter() - t0)
        per_iter = (min(tKs) - min(t1s)) / (K - 1)
        results[name] = per_iter
        print(f"{name:14s} per-iter {per_iter*1e3:8.2f} ms  (t1 {min(t1s)*1e3:.1f}, tK {min(tKs)*1e3:.1f})", flush=True)

    out = {"config": f"{N}x{N}_d{DENSITY}", "W": W, "tail": tail,
           "expand": int(expand), "nnz_c": nnz_c,
           "per_iter_s": {k: round(v, 5) for k, v in results.items()}}
    names = [n for n, _ in prefixes]
    for prev, cur in zip(names[:-1], names[1:]):
        print(f"stage {cur:14s} = {(results[cur]-results[prev])*1e3:8.2f} ms", flush=True)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
