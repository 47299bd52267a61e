"""All five routines on one seeded 500x500 d=0.3 problem (coverage parity with
the reference's ``tests/test_computation_speed.py``), scipy as oracle,
upper-triangle-only comparison for symmetric/triple outputs."""

import numpy as np
import pytest
from scipy import stats
from scipy.sparse import csr_matrix, random as sparse_random

from sparse_matrix_mult_tpu import sparse_matrix_multiply
from sparse_matrix_mult_tpu.utils import time_execution


@pytest.fixture(scope="module")
def ab():
    a = sparse_random(500, 500, density=0.3, random_state=42, data_rvs=stats.uniform().rvs)
    b = sparse_random(500, 500, density=0.3, random_state=43, data_rvs=stats.uniform().rvs)
    return csr_matrix(a), csr_matrix(b)


def test_sparse_nonsym(ab):
    a, b = ab
    result, t = time_execution(sparse_matrix_multiply, a, b, output_format="sparse")
    oracle = (a @ b).toarray()
    assert np.allclose(result.toarray(), oracle)
    print(f"\nsparse nosym: {t:.4f}s")


def test_sparse_sym(ab):
    a, b = ab
    result, t = time_execution(
        sparse_matrix_multiply, a, b, output_format="sparse", symmetric=True
    )
    oracle = (a @ b).toarray()
    assert np.allclose(np.triu(result.toarray()), np.triu(oracle))
    print(f"\nsparse sym: {t:.4f}s")


def test_dense_sym(ab):
    a, b = ab
    result, t = time_execution(
        sparse_matrix_multiply, a, b, output_format="dense", symmetric=True
    )
    oracle = (a @ b).toarray()
    assert np.allclose(np.triu(result), np.triu(oracle))
    print(f"\ndense sym: {t:.4f}s")


def test_dense_nonsym(ab):
    a, b = ab
    result, t = time_execution(sparse_matrix_multiply, a, b, output_format="dense")
    oracle = (a @ b).toarray()
    assert np.allclose(result, oracle)
    print(f"\ndense nosym: {t:.4f}s")


def test_triple_product(ab):
    a, b = ab
    result, t = time_execution(
        sparse_matrix_multiply, a, b, use_triple_product=True, compute_full_matrix=0
    )
    oracle = ((a @ b) @ a.T).toarray()
    assert np.allclose(np.triu(result), np.triu(oracle))
    assert np.allclose(np.tril(result, -1), 0.0)
    print(f"\ntriple product: {t:.4f}s")


def test_triple_product_full(ab):
    a, b = ab
    result = sparse_matrix_multiply(a, b, use_triple_product=True, compute_full_matrix=1)
    oracle = ((a @ b) @ a.T).toarray()
    # Reference contract: full output mirrors the upper triangle
    # (/root/reference/src/sparse_sparse_dense.cpp:213-215).
    expected = np.triu(oracle) + np.triu(oracle, 1).T
    assert np.allclose(result, expected)
