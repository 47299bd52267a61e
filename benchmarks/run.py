"""Benchmark suite: all five routines across the reference's test configs.

The reference published exactly one number (10k x 10k, d=0.1 symmetric CSR,
11.48 s on an M1: ``/root/reference/README.md:216-220``) and printed -- but
never asserted -- scipy-relative timings in its tests
(``tests/test_computation_speed.py``, ``tests/test_with_dense.py``).  This
harness makes those sweeps reproducible: every routine on every config, scipy
wall time vs this framework's device-resident wall time, one JSON report.

Usage::

    python benchmarks/run.py            # full sweep on the default backend
    python benchmarks/run.py --quick    # small configs only
    python benchmarks/run.py --json out.json

Device-resident timing means operands start in HBM and results stay in HBM
(the production deployment shape); a checksum transfer forces execution each
iteration.  Host round-trip timings (scipy in / scipy out) are reported
separately for the end-to-end story.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np
import scipy.sparse as sp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get(
        "SMM_TPU_CACHE_DIR",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
    ),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import sparse_matrix_mult_tpu as smm
from sparse_matrix_mult_tpu.ops.convert import dense_to_csr, dense_to_csr_triu
from sparse_matrix_mult_tpu.ops.dense_path import spgemm_dense_out
from sparse_matrix_mult_tpu.ops.triple_product import triple_product_dense

# (rows, cols, density) sweeps; the first three mirror the reference's test
# configurations (test_with_dense.py:30-109, test_computation_speed.py:10-15),
# the last is the README headline config.
CONFIGS = [
    (500, 500, 0.3),
    (1000, 1000, 0.01),
    (2000, 2000, 0.05),
    (10_000, 10_000, 0.1),
]
QUICK = CONFIGS[:2]
ITERS = 3

_RTT = None
_BW = None


def link_bandwidth() -> float:
    """Sustained device->host transfer bandwidth of the measurement link
    (bytes/s).

    The tunneled single-chip link moves bulk data at ~20 MB/s -- three
    orders of magnitude below a real deployment's PCIe/DMA path -- so any
    benchmark row that downloads a result is dominated by the link, not the
    TPU.  Measured once with an 8 MiB fetch; end-to-end rows report both
    raw wall time and wall time net of (rtt + bytes/bandwidth).
    """
    global _BW
    if _BW is None:
        nbytes = 8 << 20
        x = jnp.zeros(nbytes // 4, jnp.float32)
        f = jax.jit(lambda x: x + 1.0)
        np.asarray(f(x))  # warm
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(f(x))
            ts.append(time.perf_counter() - t0)
        _BW = nbytes / max(min(ts) - rtt_floor(), 1e-3)
    return _BW


def rtt_floor() -> float:
    """Fixed per-call round-trip latency of the device link.

    Under the tunneled single-chip backend every blocking fetch pays ~20 ms
    of transport latency that has nothing to do with the kernels being
    measured; it is measured once with a trivial program and reported
    alongside raw wall times so small-config numbers stay interpretable.
    """
    global _RTT
    if _RTT is None:
        f = jax.jit(lambda x: (x * 2).sum())
        x = jnp.ones(128)
        float(f(x))
        _RTT = min(
            (lambda t0: (float(f(x)), time.perf_counter() - t0)[1])(time.perf_counter())
            for _ in range(5)
        )
    return _RTT


def _time(fn, *args) -> float:
    chk = fn(*args)
    float(chk)  # compile + warm
    ts = []
    for _ in range(ITERS):
        t0 = time.perf_counter()
        float(fn(*args))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def bench_config(n_rows: int, n_cols: int, density: float) -> list[dict]:
    rng_a = sp.random(n_rows, n_cols, density=density, format="csr", random_state=1)
    rng_b = sp.random(n_cols, n_rows, density=density, format="csr", random_state=2)

    a = smm.from_scipy(rng_a, dtype=jnp.float32).block_until_ready()
    b = smm.from_scipy(rng_b, dtype=jnp.float32).block_until_ready()

    results = []

    def record(routine, seconds, scipy_seconds, extra=None, on_device=True):
        # Host-routed rows never touch the device: no link latency to net out.
        # Device rows faster than the link RTT's own jitter (~1 ms) cannot be
        # resolved by this harness: floor them and say so, instead of
        # printing a bogus huge ratio (round-2 review: the 1389x artifact).
        resolution = 1e-3
        adj = max(seconds - rtt_floor(), resolution) if on_device else seconds
        row = {
            "config": f"{n_rows}x{n_cols}_d{density}",
            "routine": routine,
            "seconds": round(seconds, 5),
            "seconds_minus_rtt": round(adj, 5),
            "link_rtt": round(rtt_floor(), 5),
            "scipy_seconds": round(scipy_seconds, 5),
            "speedup_vs_scipy": round(scipy_seconds / adj, 2),
            "backend": jax.default_backend(),
        }
        if on_device and seconds - rtt_floor() < resolution:
            row["below_link_resolution"] = True
        if extra:
            row.update(extra)
        results.append(row)

    # scipy oracle timings (host CPU).  Two sparse baselines: raw A@B
    # (scipy leaves per-row column order unsorted) and A@B + sort_indices
    # -- the like-for-like pipeline for this API's sorted-indices output
    # contract.  Both are reported; speedup_vs_scipy stays the raw one.
    t0 = time.perf_counter()
    c_sp = rng_a @ rng_b
    t_scipy_sparse = time.perf_counter() - t0
    t0 = time.perf_counter()
    _sorted = rng_a @ rng_b
    _sorted.sort_indices()
    t_scipy_sparse_sorted = time.perf_counter() - t0
    del _sorted
    t0 = time.perf_counter()
    _ = (rng_a @ rng_b).toarray()
    t_scipy_dense = time.perf_counter() - t0
    t0 = time.perf_counter()
    _ = (rng_a @ rng_b @ rng_a.T).toarray()
    t_scipy_triple = time.perf_counter() - t0

    # Output capacity sized from the true nnz (known from the oracle run):
    # an undersized bucket would silently truncate the device extraction.
    out_cap = smm.bucket_capacity(int(c_sp.nnz))

    # 1/2: sparse x sparse -> dense (nosym, sym)
    f_dense = jax.jit(lambda a, b: spgemm_dense_out(a, b).sum())
    record("dense_nosym", _time(f_dense, a, b), t_scipy_dense)
    # Symmetric device rows request FAST explicitly, engaging the opt-in
    # split3 triu kernel.  Accuracy is config-dependent (committed
    # results_accuracy_tpu.json): max-rel 3.8e-6 at 500^2 and 3.0e-6 at
    # 10k^2 (inside the rtol=1e-5 oracle), but 2.5e-5 at 2000^2 d=0.05 --
    # these rows benchmark the documented FAST trade-off, not the API
    # default (AUTO keeps 6-pass f32, max-rel <= 1.7e-6 everywhere).
    f_dsym = jax.jit(
        lambda a, b: spgemm_dense_out(a, b, symmetric=True, precision="fast").sum()
    )
    record("dense_sym", _time(f_dsym, a, b), t_scipy_dense)

    # 3/4: sparse x sparse -> sparse CSR (nosym, sym)
    def f_sparse(a, b):
        c = spgemm_dense_out(a, b)
        csr = dense_to_csr(c, out_cap)
        return csr.indptr[-1].astype(jnp.float32) + jnp.sum(csr.values)

    record("sparse_nosym", _time(jax.jit(f_sparse), a, b), t_scipy_sparse,
           {"nnz_c": int(c_sp.nnz)})

    def f_ssym(a, b):
        c = spgemm_dense_out(a, b, symmetric=True, precision="fast")
        csr = dense_to_csr_triu(c, out_cap)
        return csr.indptr[-1].astype(jnp.float32) + jnp.sum(csr.values)

    record("sparse_sym", _time(jax.jit(f_ssym), a, b), t_scipy_sparse)

    # End-to-end API path (scipy in / scipy out): the strategy ladder picks
    # host vs device extraction by size -- what a reference user measures.
    def _time_host(fn):
        fn()  # warm (compile + route)
        ts = []
        for _ in range(ITERS):
            t0 = time.perf_counter()
            fn()
            ts.append(time.perf_counter() - t0)
        return min(ts)

    def _record_api(name, fn, scipy_s, nnz_out):
        t_api = _time_host(fn)
        route = smm.get_last_route()
        sorted_extra = {
            "scipy_sorted_seconds": round(t_scipy_sparse_sorted, 5),
            "speedup_vs_scipy_sorted": round(t_scipy_sparse_sorted / t_api, 2),
        }
        if route == "host":
            record(name, t_api, scipy_s, {"route": route, **sorted_extra}, on_device=False)
            return
        # Device routes move the result over the measurement link; estimate
        # the transferred bytes (mirroring the API's own download-format
        # choice, api.py _dense_to_scipy_csr) so the row can be read net of
        # the link.  Real deployments move device->host at GB/s; this
        # tunnel measures ~30-45 MB/s.
        from sparse_matrix_mult_tpu.utils.transfer import fine_capacity

        mn = n_rows * n_rows
        if mn <= smm.get_config().host_extract_limit:
            bytes_out = 4 * mn  # small: dense f32 panel, single fetch
        elif nnz_out == n_rows * (n_rows + 1) // 2:
            # fully dense triu: values-only staircase download
            bytes_out = 4 * fine_capacity(nnz_out)
        else:
            bytes_out = min(4 * mn, 8 * fine_capacity(nnz_out))
        t_link = bytes_out / link_bandwidth()
        adj = max(t_api - rtt_floor() - t_link, 1e-6)
        record(
            name, t_api, scipy_s,
            {
                "route": route,
                "bytes_out": bytes_out,
                "link_bw_mb_s": round(link_bandwidth() / 1e6, 1),
                "seconds_minus_link": round(adj, 5),
                "speedup_vs_scipy_net_link": round(scipy_s / adj, 2),
                **sorted_extra,
            },
        )

    _record_api(
        "api_sparse_nosym",
        lambda: smm.sparse_matrix_multiply(rng_a, rng_b),
        t_scipy_sparse,
        int(c_sp.nnz),
    )
    nnz_triu = int(sp.triu(c_sp).nnz) if n_rows == n_cols else int(c_sp.nnz)
    if n_rows == n_cols:
        _record_api(
            "api_sparse_sym",
            lambda: smm.sparse_matrix_multiply(rng_a, rng_b, symmetric=True),
            t_scipy_sparse,
            nnz_triu,
        )

    # 5: fused triple product (A.B.A^T); B must be square = (cols x cols).
    q = smm.from_scipy(
        sp.random(n_cols, n_cols, density=density, format="csr", random_state=3),
        dtype=jnp.float32,
    ).block_until_ready()
    f_tp = jax.jit(lambda h, q: triple_product_dense(h, q).sum())
    record("triple_product", _time(f_tp, a, q), t_scipy_triple)

    return results


from sparse_matrix_mult_tpu.utils.testing import hypersparse_random as _hypersparse_random


def bench_hypersparse() -> list[dict]:
    """ESC / chunked-ESC on device: the regime where the output is far too
    sparse for the dense path (VERDICT r2 item 4).  Reference analogue: the
    Gustavson hot loop (``/root/reference/src/sparsework.cpp:56-129``) --
    these matrices are its home turf, so the honest question is how the
    device expansion-sort compares to the host kernel and scipy.

    Configs:
      * 40k x 40k, d=2e-4  -> single-dispatch ``esc`` route
      * 100k x 100k, d=1e-4 -> flop-balanced ``esc_chunks`` route
    """
    rows = []
    for n, density, expect in [
        (40_000, 2e-4, "esc_binned"),
        # 1e7 / 2e7 partials: single binned dispatches since the round-5b
        # binned_expand_limit raise (chunked-windowed before).
        (100_000, 1e-4, "esc_binned"),
        (200_000, 5e-5, "esc_binned"),
    ]:
        A = _hypersparse_random(n, n, int(density * n * n), seed=11)
        B = _hypersparse_random(n, n, int(density * n * n), seed=12)
        t0 = time.perf_counter()
        c_sp = A @ B
        t_scipy = time.perf_counter() - t0
        from sparse_matrix_mult_tpu.utils.native import spgemm_host

        # min-of-7: single-shot host timings on this contended 2-core box
        # swing 3x (the tunnel client's spinning thread steals a core);
        # min is the defensible estimator for the denominator of
        # speedup_vs_host_kernel, so give it enough trials to find a
        # quiet window.
        t_host = min(
            (lambda t0: (spgemm_host(A, B), time.perf_counter() - t0)[1])(
                time.perf_counter()
            )
            for _ in range(7)
        )
        # Force the device route (the cost model would legitimately send
        # these to host on a slow link -- the row measures the device engine).
        old = smm.get_config()
        smm.set_config(host_rate_base=1e3, host_compute_limit=0, use_bsr=False)
        try:
            def call():
                return smm.sparse_matrix_multiply(A, B)

            call()  # warm/compile
            ts = []
            for _ in range(ITERS):
                t0 = time.perf_counter()
                call()
                ts.append(time.perf_counter() - t0)
            t_dev = min(ts)
            route = smm.get_last_route()
        finally:
            smm.set_config(old)
        nnz_c = int(c_sp.nnz)
        rows.append({
            "config": f"{n}x{n}_d{density}",
            "routine": "api_sparse_nosym_hypersparse",
            "route": route,
            "route_expected": expect,
            "seconds": round(t_dev, 5),
            "nnz_c": nnz_c,
            "nnz_per_s_device": round(nnz_c / t_dev, 1),
            "scipy_seconds": round(t_scipy, 5),
            "host_kernel_seconds": round(t_host, 5),
            "speedup_vs_scipy": round(t_scipy / t_dev, 2),
            "speedup_host_vs_scipy": round(t_scipy / t_host, 2),
            "backend": jax.default_backend(),
        })

        # Device-RESIDENT engine row: operands already in HBM, result stays
        # in HBM (the production pipeline shape) -- the windowed ESC engine
        # with fine capacities, K iterations chained in one dispatch with a
        # checksum (the tunneled chip reports buffers ready early).
        from jax import lax

        from sparse_matrix_mult_tpu.ops.spgemm_jnp import (
            expansion_size,
            precompute_window_table,
            spgemm_esc_windowed,
            windowed_plan,
        )
        from sparse_matrix_mult_tpu.utils.transfer import fine_capacity

        expand = expansion_size(A.indices, A.nnz, B.indptr)
        plan = windowed_plan(A.nnz, np.diff(B.indptr)[A.indices], expand)
        w, tail = plan if plan is not None else (None, 0)
        a_d = smm.from_scipy(A, dtype=jnp.float32, capacity=fine_capacity(A.nnz)).block_until_ready()
        b_d = smm.from_scipy(B, dtype=jnp.float32, capacity=fine_capacity(B.nnz)).block_until_ready()
        EC = fine_capacity(expand)
        OC = fine_capacity(nnz_c)
        TC = fine_capacity(tail) if tail else 0
        K = 16
        import dataclasses as _dc

        def _net_iter(mk, *fargs):
            # Sustained per-iteration time with the tunneled link's fixed
            # per-dispatch RTT differenced out: (tK - t1)/(K - 1).  The
            # ~28 ms dispatch cost is a measurement-link artifact (a
            # locally attached chip dispatches in ~10 us); the profilers
            # (profile_binned*.py) use the same protocol.  All tensors are
            # jit ARGUMENTS -- closure-captured arrays become XLA
            # constants and change lowering (see ops/spgemm_binned.py).
            f1 = jax.jit(mk(1))
            fK = jax.jit(mk(K))
            float(f1(*fargs)); float(fK(*fargs))
            t1s, tKs = [], []
            for _ in range(3):
                t0 = time.perf_counter(); float(f1(*fargs)); t1s.append(time.perf_counter() - t0)
                t0 = time.perf_counter(); float(fK(*fargs)); tKs.append(time.perf_counter() - t0)
            return (min(tKs) - min(t1s)) / (K - 1), min(t1s)

        def mk_loop(kk):
            def run(a_, b_):
                def body(t, carry):
                    a2 = _dc.replace(a_, values=a_.values.at[0].add(carry * 0))
                    c = spgemm_esc_windowed(
                        a2, b_, window=w, expand_capacity=EC,
                        tail_capacity=TC, out_capacity=OC,
                    )
                    return c.values[0] + c.indptr[-1].astype(jnp.float32) * 1e-6
                return lax.fori_loop(0, kk, body, jnp.float32(0))
            return run

        if plan is not None:
            t_res, t_disp = _net_iter(mk_loop, a_d, b_d)
            rows.append({
                "config": f"{n}x{n}_d{density}",
                "routine": "device_resident_esc_windowed",
                "window": w,
                "seconds": round(t_res, 5),
                "n_partials": int(expand),
                "m_partials_per_s_device": round(expand / t_res / 1e6, 1),
                "nnz_per_s_device": round(nnz_c / t_res, 1),
                "host_kernel_seconds": round(t_host, 5),
                "m_partials_per_s_host_inprocess": round(expand / t_host / 1e6, 1),
                "speedup_vs_host_kernel": round(t_host / t_res, 2),
                "speedup_vs_scipy_compute": round(t_scipy / t_res, 2),
                "backend": jax.default_backend(),
            })

            # Symmetric (upper-triangle) device-resident row at the first
            # config -- the reference's FLAGSHIP routine shape
            # (/root/reference/README.md:216) in the hypersparse regime.
            if n == 40_000:
                c_sym = sp.triu(c_sp).tocsr()
                OCs = fine_capacity(int(c_sym.nnz))

                def mk_loop_sym(kk):
                    def run(a_, b_):
                        def body(t, carry):
                            a2 = _dc.replace(a_, values=a_.values.at[0].add(carry * 0))
                            c = spgemm_esc_windowed(
                                a2, b_, window=w, expand_capacity=EC,
                                tail_capacity=TC, out_capacity=OCs, symmetric=True,
                            )
                            return c.values[0] + c.indptr[-1].astype(jnp.float32) * 1e-6
                        return lax.fori_loop(0, kk, body, jnp.float32(0))
                    return run

                t_sym, _ = _net_iter(mk_loop_sym, a_d, b_d)
                rows.append({
                    "config": f"{n}x{n}_d{density}",
                    "routine": "device_resident_esc_windowed_sym",
                    "window": w,
                    "seconds": round(t_sym, 5),
                    "n_partials": int(expand),
                    "m_partials_per_s_device": round(expand / t_sym / 1e6, 1),
                    "nnz_per_s_device": round(int(c_sym.nnz) / t_sym, 1),
                    "host_kernel_seconds": round(t_host, 5),
                    "m_partials_per_s_host_inprocess": round(expand / t_host / 1e6, 1),
                    "speedup_vs_host_kernel": round(t_host / t_sym, 2),
                    "speedup_vs_scipy_compute": round(t_scipy / t_sym, 2),
                    "backend": jax.default_backend(),
                })

            # Amortized B-reuse row: the window table built ONCE (the
            # reference's motivating workload holds Q/H fixed across an
            # inversion), so each call skips the K*W-index table gather.
            tbl = precompute_window_table(b_d, w).block_until_ready()

            def mk_loop_tbl(kk):
                def run(a_, b_, tbl_):
                    def body(t, carry):
                        a2 = _dc.replace(a_, values=a_.values.at[0].add(carry * 0))
                        c = spgemm_esc_windowed(
                            a2, b_, window=w, expand_capacity=EC,
                            tail_capacity=TC, out_capacity=OC, b_table=tbl_,
                        )
                        return c.values[0] + c.indptr[-1].astype(jnp.float32) * 1e-6
                    return lax.fori_loop(0, kk, body, jnp.float32(0))
                return run

            t_amo, _ = _net_iter(mk_loop_tbl, a_d, b_d, tbl)
            rows.append({
                "config": f"{n}x{n}_d{density}",
                "routine": "device_resident_esc_windowed_reused_table",
                "window": w,
                "seconds": round(t_amo, 5),
                "n_partials": int(expand),
                "m_partials_per_s_device": round(expand / t_amo / 1e6, 1),
                "nnz_per_s_device": round(nnz_c / t_amo, 1),
                "host_kernel_seconds": round(t_host, 5),
                "m_partials_per_s_host_inprocess": round(expand / t_host / 1e6, 1),
                "speedup_vs_host_kernel": round(t_host / t_amo, 2),
                "speedup_vs_scipy_compute": round(t_scipy / t_amo, 2),
                "backend": jax.default_backend(),
            })

        # Row-binned 2D ESC engine (round 5): per-lane sorts instead of
        # device-wide ones.  Plan built once per operand structure (the
        # production reuse shape); nonsym + sym rows.
        from sparse_matrix_mult_tpu.ops.spgemm_binned import (
            binned_plan,
            spgemm_esc_binned,
        )

        # Mirror the API's large-dispatch tile rule (api.py binned route):
        # W=16 past 1.2e7 partials when B rows are long, else wider lanes.
        _w, _p = 8, 4096
        if expand > 12_000_000:
            if B.nnz / max(B.shape[0], 1) > 0.75 * _w:
                _w *= 2
            else:
                _p *= 2
        bplan = binned_plan(A.indptr, A.indices, B.indptr, window=_w, lane_width=_p)
        if bplan is not None:
            pargs = list(bplan.device_args())
            for x in pargs:
                x.block_until_ready()
            for sym in (False, True) if n == 40_000 else (False,):
                OCb = fine_capacity(int(sp.triu(c_sp).nnz)) if sym else OC

                def mk_loop_b(kk, _sym=sym, _oc=OCb):
                    def run(a_, b_, *p):
                        def body(t, carry):
                            a2 = _dc.replace(a_, values=a_.values.at[0].add(carry * 0))
                            c = spgemm_esc_binned(
                                a2, b_, *p, window=bplan.window,
                                out_capacity=_oc, symmetric=_sym,
                                dedup_span=bplan.max_run,
                            )
                            return c.values[0] + c.indptr[-1].astype(jnp.float32) * 1e-6
                        return lax.fori_loop(0, kk, body, jnp.float32(0))
                    return run

                t_bin, t_disp_b = _net_iter(mk_loop_b, a_d, b_d, *pargs)
                nnz_out = int(sp.triu(c_sp).nnz) if sym else nnz_c
                rows.append({
                    "config": f"{n}x{n}_d{density}",
                    "routine": "device_resident_esc_binned" + ("_sym" if sym else ""),
                    "lane_width": bplan.lane_width,
                    "window": bplan.window,
                    "seconds": round(t_bin, 5),
                    "link_dispatch_s": round(t_disp_b - t_bin, 5),
                    "n_partials": int(bplan.n_partials),
                    "m_partials_per_s_device": round(bplan.n_partials / t_bin / 1e6, 1),
                    "nnz_per_s_device": round(nnz_out / t_bin, 1),
                    "host_kernel_seconds": round(t_host, 5),
                    "m_partials_per_s_host_inprocess": round(expand / t_host / 1e6, 1),
                    "speedup_vs_host_kernel": round(t_host / t_bin, 2),
                    "speedup_vs_scipy_compute": round(t_scipy / t_bin, 2),
                    "backend": jax.default_backend(),
                })
    return rows


def bench_bsr() -> list[dict]:
    """Block-structured operands: BSR x BSR vs BSR x dense vs dense MXU.

    Both operands ~10% block occupancy at b=128 (the regime the BSR route
    targets: banded / block-structured covariance operators).  Device-
    resident, K iterations chained per dispatch with a checksum.
    """
    from jax import lax

    from sparse_matrix_mult_tpu.ops.convert import csr_to_dense
    from sparse_matrix_mult_tpu.ops.pallas.bsr_spgemm import (
        bsr_bsr_matmul_dense,
        bsr_matmul_dense,
        bsr_pair_plan,
    )
    from sparse_matrix_mult_tpu.types_bsr import bsr_from_scipy

    bsz = 128
    nb = 64  # 8192 x 8192
    occ = 0.10
    rng = np.random.default_rng(0)
    rows = []

    def block_sparse(seed):
        r = np.random.default_rng(seed)
        mask = r.random((nb, nb)) < occ
        bi, bj = np.nonzero(mask)
        n = nb * bsz
        import scipy.sparse as sp

        L = len(bi)
        blocks = r.standard_normal((L, bsz, bsz)).astype(np.float32)
        shape3 = (L, bsz, bsz)
        coo_r = np.broadcast_to(
            bi[:, None, None] * bsz + np.arange(bsz)[None, :, None], shape3
        ).ravel()
        coo_c = np.broadcast_to(
            bj[:, None, None] * bsz + np.arange(bsz)[None, None, :], shape3
        ).ravel()
        m = sp.coo_matrix((blocks.ravel(), (coo_r, coo_c)), shape=(n, n)).tocsr()
        return m

    a_sp = block_sparse(21)
    b_sp = block_sparse(22)
    a_bsr = bsr_from_scipy(a_sp, bsz, dtype=jnp.float32).block_until_ready()
    b_bsr = bsr_from_scipy(b_sp, bsz, dtype=jnp.float32).block_until_ready()
    b_csr = smm.from_scipy(b_sp, dtype=jnp.float32).block_until_ready()
    a_csr = smm.from_scipy(a_sp, dtype=jnp.float32).block_until_ready()
    plan = bsr_pair_plan(a_sp, b_sp, bsz)
    tables = tuple(
        jnp.asarray(plan[k]) for k in ("pa", "pb", "ci", "cj", "first", "mask")
    )
    K = 4

    def timed(make_step, *args):
        def loop(*args):
            def body(t, c):
                return make_step(c, *args)
            return lax.fori_loop(0, K, body, jnp.float32(0))
        f = jax.jit(loop)
        float(f(*args))
        t0 = time.perf_counter()
        float(f(*args))
        return (time.perf_counter() - t0) / K

    def s_bsrbsr(c, ab, bb, *tbl):
        out = bsr_bsr_matmul_dense(
            ab, bb, tbl[0] + (c * 0).astype(jnp.int32), *tbl[1:]
        )
        return out[0, 0] + out[-1, -1] * 0

    def s_bsrdense(c, ab, bcsr):
        bd = csr_to_dense(bcsr) + c * 0
        out = bsr_matmul_dense(ab, bd)
        return out[0, 0] + out[-1, -1] * 0

    def s_dense(c, acsr, bcsr):
        out = spgemm_dense_out(acsr, bcsr)
        return out[0, 0] + out[-1, -1] * 0 + c * 0

    t_bb = timed(s_bsrbsr, a_bsr, b_bsr, *tables)
    t_bd = timed(s_bsrdense, a_bsr, b_csr)
    t_dd = timed(s_dense, a_csr, b_csr)
    n = nb * bsz
    for name, t in (("bsr_x_bsr", t_bb), ("bsr_x_dense", t_bd), ("dense_mxu", t_dd)):
        rows.append({
            "config": f"{n}x{n}_block{bsz}_occ{occ}",
            "routine": name,
            "seconds": round(t, 5),
            "n_pairs": int(plan["n_pairs"]),
            "n_a_blocks": int(plan["n_a_blocks"]),
            "speedup_vs_bsr_dense": round(t_bd / t, 2),
            "speedup_vs_dense_mxu": round(t_dd / t, 2),
            "backend": jax.default_backend(),
        })
        print(
            f"{rows[-1]['config']:>28}  {name:<12} {t*1e3:8.2f} ms  "
            f"({rows[-1]['speedup_vs_bsr_dense']}x vs bsr_x_dense, "
            f"{rows[-1]['speedup_vs_dense_mxu']}x vs dense)"
        )
    return rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--json", default=None)
    ap.add_argument("--hypersparse", action="store_true",
                    help="also run the ESC/chunked-ESC device rows")
    ap.add_argument("--only-hypersparse", action="store_true",
                    help="run ONLY the hypersparse rows (skip the sweep)")
    ap.add_argument("--bsr", action="store_true",
                    help="run ONLY the block-structured BSR comparison rows")
    args = ap.parse_args()

    configs = [] if (args.only_hypersparse or args.bsr) else (QUICK if args.quick else CONFIGS)
    all_rows = []
    for cfg in configs:
        rows = bench_config(*cfg)
        all_rows.extend(rows)
        for r in rows:
            print(
                f"{r['config']:>22}  {r['routine']:<14} "
                f"{r['seconds_minus_rtt']*1e3:9.2f} ms (+{r['link_rtt']*1e3:.0f} link)  "
                f"scipy {r['scipy_seconds']*1e3:9.2f} ms  "
                f"({r['speedup_vs_scipy']}x)"
            )
    if args.bsr:
        all_rows.extend(bench_bsr())
    if args.hypersparse or args.only_hypersparse:
        hrows = bench_hypersparse()
        all_rows.extend(hrows)
        for r in hrows:
            if "route" in r:
                print(
                    f"{r['config']:>22}  {r['routine']:<28} route={r['route']} "
                    f"{r['seconds']:8.3f} s  scipy {r['scipy_seconds']:8.3f} s  "
                    f"host {r['host_kernel_seconds']:8.3f} s  "
                    f"({r['speedup_vs_scipy']}x vs scipy)"
                )
            else:
                print(
                    f"{r['config']:>22}  {r['routine']:<28} W={r['window']} "
                    f"{r['seconds']:8.4f} s  "
                    f"{r['m_partials_per_s_device']} M partials/s device vs "
                    f"{r['m_partials_per_s_host_inprocess']} M/s host in-process "
                    f"({r['speedup_vs_host_kernel']}x host, "
                    f"{r['speedup_vs_scipy_compute']}x scipy compute)"
                )
    if args.json:
        with open(args.json, "w") as f:
            json.dump(all_rows, f, indent=2)
        print(f"wrote {args.json}")


if __name__ == "__main__":
    main()
