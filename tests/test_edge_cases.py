"""Degenerate-input tests (coverage parity with the reference's
``tests/test_edge_case.py``): 1x1, trailing zero rows, all-zero operands, and
the empty-operand fast path."""

import numpy as np
import pytest
from scipy.sparse import csr_matrix

from sparse_matrix_mult_tpu import sparse_matrix_multiply


def test_one_by_one():
    r = sparse_matrix_multiply(np.array([[5.0]]), np.array([[2.0]]), output_format="dense", symmetric=True)
    assert np.allclose(r, [[10.0]])


def test_trailing_zero_rows_dense():
    a = np.vstack([np.arange(1, 10).reshape(3, 3).astype(float), np.zeros((3, 3))])
    b = np.random.default_rng(7).random((3, 4))
    r = sparse_matrix_multiply(a, b, output_format="dense")
    assert r.shape == (6, 4)
    assert np.allclose(r, a @ b)


def test_trailing_zero_rows_sparse():
    a = csr_matrix(
        np.vstack([np.arange(1, 10).reshape(3, 3).astype(float), np.zeros((3, 3))])
    )
    b = csr_matrix(np.random.default_rng(8).random((3, 4)))
    r = sparse_matrix_multiply(a, b, output_format="sparse")
    assert r.shape == (6, 4)
    assert np.allclose(r.toarray(), (a @ b).toarray())


def test_zero_matrix_dense_inputs():
    r = sparse_matrix_multiply(np.zeros((3, 3)), np.zeros((3, 4)), output_format="sparse")
    assert r.shape == (3, 4)
    assert r.nnz == 0


def test_zero_matrix_sparse_inputs():
    r = sparse_matrix_multiply(csr_matrix((3, 3)), csr_matrix((3, 4)), output_format="sparse")
    assert r.shape == (3, 4)
    assert r.nnz == 0


def test_zero_matrix_dense_output():
    r = sparse_matrix_multiply(np.zeros((3, 3)), np.zeros((3, 4)), output_format="dense")
    assert isinstance(r, np.ndarray)
    assert r.shape == (3, 4)
    assert np.all(r == 0)


def test_empty_triple_product():
    r = sparse_matrix_multiply(csr_matrix((4, 3)), csr_matrix((3, 3)), use_triple_product=True)
    assert r.shape == (4, 4)
    assert np.all(r == 0)


def test_single_entry_matrices():
    a = csr_matrix(([3.0], ([2], [1])), shape=(4, 3))
    b = csr_matrix(([2.0], ([1], [2])), shape=(3, 5))
    r = sparse_matrix_multiply(a, b, output_format="sparse")
    expected = (a @ b).toarray()
    assert np.allclose(r.toarray(), expected)


def test_structurally_nonzero_but_valueless_product():
    # A row of A hits only zero columns of B: structural product exists,
    # values cancel to nothing nonzero.
    a = csr_matrix(np.array([[1.0, 0.0], [0.0, 0.0]]))
    b = csr_matrix(np.array([[0.0, 0.0], [1.0, 0.0]]))
    r = sparse_matrix_multiply(a, b, output_format="dense")
    assert np.allclose(r, np.zeros((2, 2)))
