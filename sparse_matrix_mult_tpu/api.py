"""Reference-compatible public API.

Drop-in replacement for the reference's single entry point
``sparse_matrix_multiply``
(``/root/reference/sparse_matrix_mult/matrix_ops.py:271-387``): same
signature, same five routines, same scipy-in/scipy-out types, same validation
errors, same empty-operand fast path, same upper-triangle-only contract for
symmetric outputs, and the same "zero matrix" stdout notice.

Differences (deliberate, per design review of the reference):

* Real exceptions propagate -- the reference's catch-all that silently returns
  a zero matrix (``matrix_ops.py:377-387``) is **not** replicated.
* ``imem_size`` is validated identically but is a no-op performance hint: XLA
  owns buffer management, so the percent-of-dense heuristic
  (``sparse_sparse_sparse.cpp:69-80``) has no TPU analogue.
* Compute runs on the default JAX backend (TPU when present) under the
  precision policy in :mod:`sparse_matrix_mult_tpu.config`.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp
from scipy.sparse import csr_matrix, isspmatrix_csr

from .config import Precision, get_config
from .ops.convert import dense_to_csr
from .ops.dense_path import dense_path_fits, spgemm_dense_out
from .ops.matmul import resolve_precision
from .ops.spgemm_jnp import expansion_size, spgemm_esc
from .ops.triple_product import triple_product_dense
from .types import CSRMatrix, bucket_capacity, from_scipy, to_scipy
from .utils.native import csr_triu, stitch_csr

__all__ = ["sparse_matrix_multiply", "multiply", "triple_product"]


# Expansion-sort is used when the dense panels would not fit on device but
# the number of partial products is small (hypersparse operands).  Measured
# on v5e: ESC is sort-dominated (~25 ms at 1e5 partial products, ~10 s at
# 2e7), so the cutover to the out-of-core dense-chunk path sits low.
_EXPAND_LIMIT = 1 << 22


def _coerce_csr(m):
    if not isspmatrix_csr(m):
        m = csr_matrix(m)
    return m


def _upload_dtype(a_sp, b_sp):
    """Device dtype for the resolved precision policy.

    Under the FAST policy all arithmetic is f32 on the MXU anyway, so
    uploading f64 operands only doubles transfer and -- worse -- forces the
    result back to f64, gating out the f32-only Pallas conversion kernels.
    Results are upcast to float64 at the host boundary (bit-identical to
    casting on device).  Returns (dtype, resolved_precision).
    """
    if jax.default_backend() != "tpu":
        return None, None  # CPU computes native f64; keep exact parity
    m, k = a_sp.shape
    n = b_sp.shape[1]
    # Expected accumulation terms per output element (exact nnz on host).
    terms = (a_sp.nnz * b_sp.nnz) / max(m * k * n, 1)
    prec = resolve_precision(None, terms)
    if prec == Precision.FAST:
        return jnp.float32, prec
    return None, prec


@functools.partial(jax.jit, static_argnames=("symmetric",))
def _dense_product(a: CSRMatrix, b: CSRMatrix, symmetric: bool):
    c = spgemm_dense_out(a, b, symmetric=symmetric)
    return c, jnp.sum(c != 0)


@functools.partial(jax.jit, static_argnames=("out_capacity",))
def _extract_csr(c, out_capacity: int):
    return dense_to_csr(c, out_capacity)


def _sparse_out_host(a_sp, b_sp, symmetric: bool):
    """sparse x sparse -> scipy CSR, choosing the device strategy by size."""
    m, k = a_sp.shape
    n = b_sp.shape[1]

    if dense_path_fits((m, k), (k, n), (m, n)):
        # MXU dense path + on-device extraction: fastest at the densities
        # the reference targets (see SURVEY.md section 6).  The dense product
        # stays on device between the count and the extraction.
        dtype, _ = _upload_dtype(a_sp, b_sp)
        a = from_scipy(a_sp, dtype=dtype)
        b = from_scipy(b_sp, dtype=dtype)
        c, nnz_dev = _dense_product(a, b, symmetric)
        nnz = int(nnz_dev)
        csr = _extract_csr(c, bucket_capacity(nnz))
        out = to_scipy(csr)
        if out.dtype != np.float64:
            out = out.astype(np.float64)
        return out

    expand = expansion_size(a_sp.indices, a_sp.nnz, b_sp.indptr)
    if expand <= _EXPAND_LIMIT and m * n < 2**31:
        # Expansion-sort: exact structure (keeps Gustavson's structural
        # zeros), capacities exact-then-bucketed.
        a = from_scipy(a_sp)
        b = from_scipy(b_sp)
        out_cap = bucket_capacity(min(expand, m * n))
        c = spgemm_esc(
            a,
            b,
            expand_capacity=bucket_capacity(expand),
            out_capacity=out_cap,
            symmetric=symmetric,
        )
        return to_scipy(c)

    # Out-of-core fallback: process A in row chunks so each chunk's dense
    # panel fits on device; assemble the scipy result on host.  This is the
    # TPU analogue of the reference's row-partitioned workers
    # (workdivision.cpp:16-89) with the host as the stitcher.
    limit = get_config().dense_path_limit
    chunk = max(1, min(m, limit // max(n, 1)))
    parts = []
    for start in range(0, m, chunk):
        stop = min(start + chunk, m)
        sub = a_sp[start:stop]
        parts.append(_sparse_out_host(sub, b_sp, False))
    out = stitch_csr(parts, m, n)
    if symmetric:
        out = csr_triu(out)
    return out


def _zero_notice(result):
    if not get_config().zero_result_notice:
        return
    if isinstance(result, np.ndarray) and np.all(result == 0):
        print("Multiplication resulted in a zero matrix.")
    elif sp.issparse(result) and result.nnz == 0:
        print("Multiplication resulted in a zero matrix.")


def sparse_matrix_multiply(
    matrix_a,
    matrix_b,
    output_format="sparse",
    symmetric=False,
    imem_size=None,
    use_triple_product=False,
    compute_full_matrix=None,
):
    """Multiply two sparse matrices on TPU; reference-parity dispatcher.

    Parameters and dispatch mirror ``matrix_ops.py:271-368``:

    * ``output_format='sparse'`` -> scipy CSR (upper triangle only when
      ``symmetric=True``).
    * ``output_format='dense'``  -> numpy ndarray (upper triangle only when
      ``symmetric=True``).
    * ``use_triple_product=True``-> dense ``A . B . A^T`` (upper triangle, or
      mirrored-full with ``compute_full_matrix=1``); ``output_format`` is
      ignored, as in the reference.
    """
    # -- parameter normalization (parity with matrix_ops.py:290-305) --------
    if imem_size is None:
        imem_size = 5
    else:
        try:
            imem_size = int(imem_size)
        except (ValueError, TypeError):
            raise ValueError(
                f"imem_size must be an integer or None, got {type(imem_size)}"
            )

    if compute_full_matrix is None:
        compute_full_matrix = 0
    else:
        if compute_full_matrix not in (0, 1):
            raise ValueError("compute_full_matrix must be None, 0, or 1")
        compute_full_matrix = int(compute_full_matrix)

    matrix_a = _coerce_csr(matrix_a)
    matrix_b = _coerce_csr(matrix_b)

    if matrix_a.shape[1] != matrix_b.shape[0]:
        raise ValueError("Matrix dimensions are incompatible for multiplication.")

    # Empty-operand fast path (matrix_ops.py:315-319).
    if matrix_a.nnz == 0 or matrix_b.nnz == 0:
        if use_triple_product:
            return np.zeros((matrix_a.shape[0], matrix_a.shape[0]))
        if output_format == "sparse":
            return csr_matrix((matrix_a.shape[0], matrix_b.shape[1]))
        return np.zeros((matrix_a.shape[0], matrix_b.shape[1]))

    if symmetric and (matrix_a.shape[0] != matrix_b.shape[1]):
        raise ValueError("For symmetric output, the resulting matrix must be square.")

    if use_triple_product:
        if matrix_a.shape[1] != matrix_b.shape[1]:
            raise ValueError(
                "Triple product requires B.cols == A.cols so that (A.B).A^T "
                "is well defined."
            )
        dtype, _ = _upload_dtype(matrix_a, matrix_b)
        h = from_scipy(matrix_a, dtype=dtype)
        q = from_scipy(matrix_b, dtype=dtype)
        result = np.asarray(
            triple_product_dense(h, q, compute_full_matrix), dtype=np.float64
        )
    elif output_format == "sparse":
        result = _sparse_out_host(matrix_a, matrix_b, symmetric)
    elif output_format == "dense":
        dtype, _ = _upload_dtype(matrix_a, matrix_b)
        a = from_scipy(matrix_a, dtype=dtype)
        b = from_scipy(matrix_b, dtype=dtype)
        result = np.asarray(
            spgemm_dense_out(a, b, symmetric=symmetric), dtype=np.float64
        )
    else:
        raise ValueError("Invalid output_format. Choose 'sparse' or 'dense'.")

    _zero_notice(result)
    return result


# ---------------------------------------------------------------------------
# Device-native API (jit-composable; CSRMatrix in -> CSRMatrix/dense out).
# ---------------------------------------------------------------------------

def multiply(
    a: CSRMatrix,
    b: CSRMatrix,
    *,
    output_format: str = "sparse",
    symmetric: bool = False,
    out_capacity: int | None = None,
    expand_capacity: int | None = None,
    precision: str | None = None,
):
    """Device-resident multiply for JAX programs (composable under ``jit``).

    Sparse output requires static capacities (XLA static shapes); see
    :func:`sparse_matrix_mult_tpu.ops.spgemm_jnp.spgemm_esc`.
    """
    if output_format == "dense":
        return spgemm_dense_out(a, b, symmetric=symmetric, precision=precision)
    if output_format == "sparse":
        if out_capacity is None:
            raise ValueError("sparse output under jit requires out_capacity")
        if expand_capacity is not None:
            return spgemm_esc(
                a,
                b,
                expand_capacity=expand_capacity,
                out_capacity=out_capacity,
                symmetric=symmetric,
            )
        c = spgemm_dense_out(a, b, symmetric=symmetric, precision=precision)
        return dense_to_csr(c, out_capacity)
    raise ValueError("Invalid output_format. Choose 'sparse' or 'dense'.")


def triple_product(h: CSRMatrix, q: CSRMatrix, compute_full_matrix: int = 0, precision=None):
    """Device-resident fused ``H . Q . H^T`` (see ops.triple_product)."""
    return triple_product_dense(h, q, compute_full_matrix, precision=precision)
