"""Random-matrix differential sweep (coverage parity with the reference's
``tests/test_with_dense.py``): size/density grid, non-square shapes, identity
product, and the 1000x1000 d=0.01 'large' configuration."""

import numpy as np
import pytest
from scipy.sparse import random as sparse_random, eye

from sparse_matrix_mult_tpu import sparse_matrix_multiply


@pytest.mark.parametrize(
    "size,density",
    [(5, 0.01), (5, 0.1), (5, 0.3), (6, 0.01), (6, 0.1), (6, 0.3), (64, 0.05), (64, 0.3)],
)
def test_sparsity_grid(size, density):
    a = sparse_random(size, size, density=density, format="csr", random_state=size * 100 + 1)
    b = sparse_random(size, size, density=density, format="csr", random_state=size * 100 + 2)
    result = sparse_matrix_multiply(a, b, output_format="sparse")
    expected = a @ b
    assert np.allclose(result.toarray(), expected.toarray()), (
        f"mismatch at size={size} density={density}"
    )


def test_non_square():
    a = sparse_random(500, 400, density=0.1, format="csr", random_state=11)
    b = sparse_random(400, 500, density=0.1, format="csr", random_state=12)
    result = sparse_matrix_multiply(a, b, output_format="sparse")
    assert np.allclose(result.toarray(), (a @ b).toarray())


def test_identity():
    a = sparse_random(500, 500, density=0.1, format="csr", random_state=13)
    i = eye(500, format="csr")
    result = sparse_matrix_multiply(a, i, output_format="sparse")
    assert np.allclose(result.toarray(), a.toarray())


def test_large_sparse():
    a = sparse_random(1000, 1000, density=0.01, format="csr", random_state=14)
    b = sparse_random(1000, 1000, density=0.01, format="csr", random_state=15)
    result = sparse_matrix_multiply(a, b, output_format="sparse")
    assert np.allclose(result.toarray(), (a @ b).toarray())


def test_dense_output_matches_sparse_output():
    a = sparse_random(200, 300, density=0.05, format="csr", random_state=16)
    b = sparse_random(300, 150, density=0.05, format="csr", random_state=17)
    dense = sparse_matrix_multiply(a, b, output_format="dense")
    sparse = sparse_matrix_multiply(a, b, output_format="sparse")
    assert np.allclose(dense, sparse.toarray())


# ---------------------------------------------------------------------------
# Property-style randomized sweep: every routine on randomized shapes,
# densities, and value distributions (seeded for reproducibility) -- the
# coverage class SURVEY.md section 4 notes the reference lacks.
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("seed", range(8))
def test_property_sweep_all_routines(seed):
    rng = np.random.default_rng(seed)
    m = int(rng.integers(1, 120))
    k = int(rng.integers(1, 120))
    n = int(rng.integers(1, 120))
    da = float(rng.uniform(0.01, 0.5))
    db = float(rng.uniform(0.01, 0.5))
    a = sparse_random(m, k, density=da, format="csr", random_state=seed * 7 + 1)
    b = sparse_random(k, n, density=db, format="csr", random_state=seed * 7 + 2)
    # Mix in negative and large-magnitude values.
    a.data = (a.data - 0.5) * 10.0 ** rng.integers(-3, 4)
    ref = (a @ b).toarray()

    got = sparse_matrix_multiply(a, b, output_format="sparse")
    np.testing.assert_allclose(got.toarray(), ref, rtol=1e-5, atol=1e-8)
    got_d = sparse_matrix_multiply(a, b, output_format="dense")
    np.testing.assert_allclose(got_d, ref, rtol=1e-5, atol=1e-8)

    if m == n:
        got_s = sparse_matrix_multiply(a, b, symmetric=True)
        np.testing.assert_allclose(
            got_s.toarray(), np.triu(ref), rtol=1e-5, atol=1e-8
        )

    # Triple product needs B square with B.cols == A.cols.
    q = sparse_random(k, k, density=db, format="csr", random_state=seed * 7 + 3)
    tp_ref = (a @ q @ a.T).toarray()
    got_t = sparse_matrix_multiply(a, q, use_triple_product=True)
    np.testing.assert_allclose(got_t, np.triu(tp_ref), rtol=1e-5, atol=1e-7)
    got_tf = sparse_matrix_multiply(
        a, q, use_triple_product=True, compute_full_matrix=1
    )
    np.testing.assert_allclose(
        got_tf, np.triu(tp_ref) + np.triu(tp_ref, 1).T, rtol=1e-5, atol=1e-7
    )


@pytest.mark.parametrize("seed", range(8))
def test_router_fuzz_all_formats(seed):
    """Router fuzz: random shapes/densities through every output format and
    the triple product, vs scipy at the reference oracle tolerance.  The
    route taken varies with the calibrated link and config defaults -- the
    point is that EVERY route the ladder picks is correct."""
    import numpy as np

    rng = np.random.default_rng(500 + seed)
    m = int(rng.integers(10, 300))
    k = int(rng.integers(10, 300))
    n = int(rng.integers(10, 300))
    da = float(rng.uniform(0.003, 0.2))
    db = float(rng.uniform(0.003, 0.2))
    a = sparse_random(m, k, density=da, format="csr", random_state=int(rng.integers(2**31)))
    b = sparse_random(k, n, density=db, format="csr", random_state=int(rng.integers(2**31)))
    ref = (a @ b).toarray()
    got = sparse_matrix_multiply(a, b, output_format="sparse")
    assert np.allclose(got.toarray(), ref, rtol=1e-5, atol=1e-8)
    got_d = sparse_matrix_multiply(a, b, output_format="dense")
    assert np.allclose(got_d, ref, rtol=1e-5, atol=1e-8)
    if m == n:
        got_s = sparse_matrix_multiply(a, b, symmetric=True)
        assert np.allclose(got_s.toarray(), np.triu(ref), rtol=1e-5, atol=1e-8)
    # Triple product needs B square (k x k).  compute_full_matrix=1 mirrors
    # the computed UPPER triangle (reference semantics,
    # /root/reference/src/sparse_sparse_dense.cpp:213-215) -- for a general
    # (non-symmetric) Q that is triu(C) + triu(C, 1).T, not C itself.
    q = sparse_random(k, k, density=db, format="csr", random_state=int(rng.integers(2**31)))
    t = sparse_matrix_multiply(a, q, use_triple_product=True, compute_full_matrix=1)
    ref_t = (a @ q @ a.T).toarray()
    expect = np.triu(ref_t) + np.triu(ref_t, 1).T
    assert np.allclose(t, expect, rtol=1e-5, atol=1e-8)
