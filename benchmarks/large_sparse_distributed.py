"""SURVEY section-5 target workload: a 1M x 1M hypersparse product across
the mesh with the sparse local contraction -- nothing densified anywhere.

A 1M x 1M d=1e-5 operand is ~120 MB as CSR but its dense shard panels
would be ~0.5 TB per device (f32, 8 shards): only the sparse engine
(``spgemm_csr_distributed_sparse``) can run it.  This harness executes the
full pipeline -- flop-balanced sharded ingest, CSR ring, per-shard
expand/lex-sort/compress, host stitch -- on the virtual 8-device CPU mesh
(identical program to a TPU pod slice) and differentially checks the
result against scipy.

Usage::

    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python benchmarks/large_sparse_distributed.py --rows 1000000 \
        --nnz 10000000 --json benchmarks/results_large_sparse_cpu.json
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


from sparse_matrix_mult_tpu.utils.testing import hypersparse_random as hypersparse  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=1_000_000)
    ap.add_argument("--nnz", type=int, default=10_000_000)
    ap.add_argument("--json", default=None)
    ap.add_argument(
        "--single-chip",
        action="store_true",
        help="run the SAME operands through the single-chip device-resident "
        "binned ESC engine on the default backend (the real TPU) and merge "
        "into the artifact -- the denominator for the mesh's contribution "
        "(VERDICT r4 item 6)",
    )
    ap.add_argument("--cpu-mesh", action="store_true", default=None)
    args = ap.parse_args()
    if args.cpu_mesh is None:
        args.cpu_mesh = not args.single_chip

    if args.single_chip:
        return single_chip(args)

    if args.cpu_mesh:
        flags = os.environ.get("XLA_FLAGS", "")
        if "xla_force_host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags + " --xla_force_host_platform_device_count=8"
            ).strip()
        import jax

        jax.config.update("jax_platforms", "cpu")
        from jax._src import xla_bridge as _xb

        if _xb.backends_are_initialized():
            _xb._clear_backends()

    import jax

    from sparse_matrix_mult_tpu.parallel.distributed import (
        spgemm_csr_distributed_sparse,
    )
    from sparse_matrix_mult_tpu.parallel.mesh import row_mesh

    m = args.rows
    print(f"building {m}x{m} operands with ~{args.nnz} nnz each ...", flush=True)
    A = hypersparse(m, m, args.nnz, 51)
    B = hypersparse(m, m, args.nnz, 52)

    t0 = time.perf_counter()
    ref = A @ B
    t_scipy = time.perf_counter() - t0
    print(f"scipy: {t_scipy:.1f} s, nnz(C)={ref.nnz}", flush=True)

    mesh = row_mesh()
    S = mesh.devices.size
    dense_panel_gb = (m / S) * m * 4 / 1e9

    t0 = time.perf_counter()
    out = spgemm_csr_distributed_sparse(A, B, mesh=mesh, balance="flops")
    jax.block_until_ready((out.indptrs, out.indices, out.values))
    t_first = time.perf_counter() - t0  # includes compile + ingest
    t0 = time.perf_counter()
    out = spgemm_csr_distributed_sparse(A, B, mesh=mesh, balance="flops")
    jax.block_until_ready((out.indptrs, out.indices, out.values))
    t_warm = time.perf_counter() - t0  # ingest + compute (compile cached)

    t0 = time.perf_counter()
    got = out.to_scipy()
    t_stitch = time.perf_counter() - t0

    assert got.nnz == ref.nnz, (got.nnz, ref.nnz)
    err = abs(got - ref).max()
    assert err < 1e-8, err

    report = {
        "benchmark": "large_sparse_distributed",
        "backend": jax.default_backend(),
        "devices": S,
        "rows": m,
        "nnz_a": int(A.nnz),
        "nnz_c": int(ref.nnz),
        "dense_shard_panel_gb": round(dense_panel_gb, 1),
        "seconds_first_call": round(t_first, 2),
        "seconds_warm": round(t_warm, 2),
        "seconds_stitch_to_scipy": round(t_stitch, 2),
        "scipy_seconds": round(t_scipy, 2),
        "max_abs_err": float(err),
        "exact_structure": True,
    }
    print(json.dumps(report, indent=2))
    if args.json:
        with open(args.json, "w") as f:
            json.dump(report, f, indent=2)
        print(f"wrote {args.json}")


def single_chip(args):
    """Device-resident single-chip run of the same 1M x 1M product: one
    binned-ESC dispatch (operands, plan and result all in HBM), timed with
    a chained checksum.  Merged into the artifact next to the mesh run so
    the distributed engine has a per-chip denominator."""
    import dataclasses as dc
    import time

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
    from sparse_matrix_mult_tpu.ops.spgemm_binned import binned_plan, spgemm_esc_binned
    from sparse_matrix_mult_tpu.utils.transfer import fine_capacity

    m = args.rows
    print(f"building {m}x{m} operands with ~{args.nnz} nnz each ...", flush=True)
    A = hypersparse(m, m, args.nnz, 51)
    B = hypersparse(m, m, args.nnz, 52)
    t0 = time.perf_counter()
    ref_nnz = int((A @ B).nnz)
    t_scipy = time.perf_counter() - t0
    print(f"scipy: {t_scipy:.1f} s, nnz(C)={ref_nnz}", flush=True)

    t0 = time.perf_counter()
    plan = binned_plan(A.indptr, A.indices, B.indptr, window=8, lane_width=16384)
    t_plan = time.perf_counter() - t0
    assert plan is not None
    print(f"plan: {t_plan:.1f} s, G={plan.va_start.shape[0]}, padded={plan.padded}", flush=True)

    t0 = time.perf_counter()
    a = smm.from_scipy(A, dtype=jnp.float32, capacity=fine_capacity(A.nnz))
    b = smm.from_scipy(B, dtype=jnp.float32, capacity=fine_capacity(B.nnz))
    pargs = list(plan.device_args())
    jax.block_until_ready([a.values, b.values] + pargs)
    t_upload = time.perf_counter() - t0
    OC = fine_capacity(ref_nnz)

    K = 2

    def loop(a_, b_, *p):
        def body(t, carry):
            a2 = dc.replace(a_, values=a_.values.at[0].add(carry * 0))
            c = spgemm_esc_binned(a2, b_, *p, window=plan.window, out_capacity=OC, dedup_span=plan.max_run)
            return c.values[0] + c.indptr[-1].astype(jnp.float32) * 1e-6
        return lax.fori_loop(0, K, body, jnp.float32(0))

    f = jax.jit(loop)
    t0 = time.perf_counter()
    float(f(a, b, *pargs))
    t_first = time.perf_counter() - t0
    t0 = time.perf_counter()
    float(f(a, b, *pargs))
    t_warm = (time.perf_counter() - t0) / K

    # Exactness spot check without downloading 800 MB over the tunnel:
    # device-side nnz + checksum vs scipy.
    c = spgemm_esc_binned(a, b, *pargs, window=plan.window, out_capacity=OC, dedup_span=plan.max_run)
    got_nnz = int(c.indptr[-1])
    assert got_nnz == ref_nnz, (got_nnz, ref_nnz)

    row = {
        "routine": "single_chip_binned_esc_device_resident",
        "backend": jax.default_backend(),
        "rows": m,
        "nnz_a": int(A.nnz),
        "nnz_c": ref_nnz,
        "n_partials": int(plan.n_partials),
        "plan_seconds_host": round(t_plan, 2),
        "upload_seconds": round(t_upload, 2),
        "seconds_first_call": round(t_first, 2),
        "seconds_warm": round(t_warm, 2),
        "m_partials_per_s": round(plan.n_partials / t_warm / 1e6, 1),
        "scipy_seconds": round(t_scipy, 2),
        "speedup_vs_scipy_compute": round(t_scipy / t_warm, 2),
        "nnz_exact": True,
    }
    print(json.dumps(row, indent=2))
    if args.json:
        merged = {}
        if os.path.exists(args.json):
            with open(args.json) as fjson:
                merged = json.load(fjson)
        merged["single_chip"] = row
        with open(args.json, "w") as fjson:
            json.dump(merged, fjson, indent=2)
        print(f"merged into {args.json}")


if __name__ == "__main__":
    main()
