"""Accuracy report: precision policies vs the float64 oracle, on device.

The reference's acceptance oracle is scipy at rtol=1e-5/atol=1e-8
(``/root/reference/tests/test_basic.py:54``).  On TPU this framework computes
under precision policies (``config.Precision``); this harness measures, on
the real backend, the max relative error of each policy against the f64
scipy oracle at the reference's benchmark sizes -- the committed evidence
behind the policy docstrings' error claims.

Max relative error here = max |got - ref| / (|ref| + atol_floor), with
atol_floor = 1e-8 matching the oracle's atol.

Usage::

    python benchmarks/accuracy.py [--json benchmarks/results_accuracy_tpu.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

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
from sparse_matrix_mult_tpu.ops.dense_path import spgemm_dense_out
from sparse_matrix_mult_tpu.ops.pallas.triu_matmul import matmul_triu
from sparse_matrix_mult_tpu.types import from_scipy

CONFIGS = [
    (500, 0.3),
    (2000, 0.05),
    (10_000, 0.1),
]
ORACLE_RTOL = 1e-5  # /root/reference/tests/test_basic.py:54
ATOL_FLOOR = 1e-8


def max_rel(got: np.ndarray, ref: np.ndarray) -> float:
    return float(np.max(np.abs(got - ref) / (np.abs(ref) + ATOL_FLOOR)))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--json", default=None)
    args = ap.parse_args()

    rows = []
    for n, density in CONFIGS:
        A = sp.random(n, n, density=density, format="csr", random_state=1)
        B = sp.random(n, n, density=density, format="csr", random_state=2)
        ref = (A @ B).toarray()  # scipy f64 oracle

        a32 = from_scipy(A, dtype=jnp.float32)
        b32 = from_scipy(B, dtype=jnp.float32)

        row = {
            "config": f"{n}x{n}_d{density}",
            "backend": jax.default_backend(),
        }
        # FAST: f32 operands, 6-pass (HIGHEST) MXU matmul.
        got = np.asarray(spgemm_dense_out(a32, b32, precision="fast"), np.float64)
        row["fast_max_rel"] = max_rel(got, ref)

        # SPLIT: double-f32 operand split (values split on device).
        a64 = from_scipy(A)
        b64 = from_scipy(B)
        got = np.asarray(spgemm_dense_out(a64, b64, precision="split"), np.float64)
        row["split_max_rel"] = max_rel(got, ref)

        # split3: double-bf16 3-pass in the triu kernel (explicit FAST only).
        if jax.default_backend() == "tpu":
            from sparse_matrix_mult_tpu.ops.convert import csr_to_dense

            ad = csr_to_dense(a32, jnp.float32)
            bd = csr_to_dense(b32, jnp.float32)
            got = np.triu(np.asarray(matmul_triu(ad, bd, split3=True), np.float64))
            row["triu_split3_max_rel"] = max_rel(np.triu(got), np.triu(ref))
            got6 = np.triu(np.asarray(matmul_triu(ad, bd, split3=False), np.float64))
            row["triu_f32_max_rel"] = max_rel(np.triu(got6), np.triu(ref))

            # What an explicit-FAST API caller ACTUALLY gets after the
            # round-5 size/term gate (split3 where the error model clears
            # the oracle, 6-pass f32 where it does not).
            from sparse_matrix_mult_tpu.ops.dense_path import _split3_within_oracle

            row["split3_gate_engaged"] = bool(_split3_within_oracle(a32, b32))
            got_api = np.asarray(
                spgemm_dense_out(a32, b32, symmetric=True, precision="fast"),
                np.float64,
            )
            row["api_fast_sym_max_rel"] = max_rel(np.triu(got_api), np.triu(ref))

        row["oracle_rtol"] = ORACLE_RTOL
        row["fast_inside_oracle"] = row["fast_max_rel"] < ORACLE_RTOL
        row["split_inside_oracle"] = row["split_max_rel"] < ORACLE_RTOL
        if "api_fast_sym_max_rel" in row:
            row["api_fast_sym_inside_oracle"] = (
                row["api_fast_sym_max_rel"] < ORACLE_RTOL
            )
        rows.append(row)
        print(json.dumps(row))

    if args.json:
        with open(args.json, "w") as f:
            json.dump(rows, f, indent=2)
        print(f"wrote {args.json}")


if __name__ == "__main__":
    main()
