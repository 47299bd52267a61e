"""Deterministic differential tests for all four non-triple routines.

Mirrors the coverage of the reference's ``tests/test_matrix_multiply.py``
(hand-written small matrices, numpy as oracle, dense inputs exercising the
auto-CSR coercion path) with freshly constructed fixtures.
"""

import numpy as np
import pytest
from scipy.sparse import csr_matrix

from sparse_matrix_mult_tpu import sparse_matrix_multiply


@pytest.fixture(scope="module")
def mats():
    rng = np.random.default_rng(1234)

    def sparse_nd(r, c, density):
        m = rng.random((r, c))
        m[rng.random((r, c)) > density] = 0.0
        return m

    a8 = sparse_nd(8, 8, 0.35)
    b8 = sparse_nd(8, 8, 0.35)
    c_rect = np.arange(1, 9 * 12 + 1, dtype=float).reshape(9, 12)
    d_rect = (np.arange(12 * 6, dtype=float) / 10.0 + 0.1).reshape(12, 6)
    f_rect = np.arange(1, 12 * 9 + 1, dtype=float).reshape(12, 9)
    return {
        "a8": a8,
        "b8": b8,
        "a8_csr": csr_matrix(a8),
        "b8_csr": csr_matrix(b8),
        "c": c_rect,
        "d": d_rect,
        "f": f_rect,
    }


def test_sparse_nonsym_dense_inputs(mats):
    # Dense ndarray inputs exercise the auto-coercion path.
    result = sparse_matrix_multiply(mats["c"], mats["d"], output_format="sparse")
    expected = mats["c"] @ mats["d"]
    assert result.shape == expected.shape
    assert np.allclose(result.toarray(), expected)


def test_sparse_nonsym_csr_inputs(mats):
    result = sparse_matrix_multiply(mats["a8_csr"], mats["b8_csr"], output_format="sparse")
    expected = mats["a8"] @ mats["b8"]
    assert np.allclose(result.toarray(), expected)


def test_dense_nonsym(mats):
    result = sparse_matrix_multiply(mats["c"], mats["d"], output_format="dense")
    expected = mats["c"] @ mats["d"]
    assert isinstance(result, np.ndarray)
    assert result.shape == expected.shape
    assert np.allclose(result, expected)


def test_dense_sym_upper_triangle_only(mats):
    result = sparse_matrix_multiply(mats["c"], mats["f"], output_format="dense", symmetric=True)
    expected = mats["c"] @ mats["f"]
    assert result.shape == expected.shape
    assert np.allclose(np.triu(result), np.triu(expected))
    # contract: lower triangle is left zero
    assert np.allclose(np.tril(result, -1), 0.0)


def test_sparse_sym_upper_triangle_only(mats):
    result = sparse_matrix_multiply(mats["c"], mats["f"], output_format="sparse", symmetric=True)
    expected = mats["c"] @ mats["f"]
    dense = result.toarray()
    assert result.shape == expected.shape
    assert np.allclose(np.triu(dense), np.triu(expected))
    assert np.allclose(np.tril(dense, -1), 0.0)


def test_square_sparse_sym(mats):
    result = sparse_matrix_multiply(mats["a8_csr"], mats["b8_csr"], output_format="sparse", symmetric=True)
    expected = mats["a8"] @ mats["b8"]
    assert np.allclose(np.triu(result.toarray()), np.triu(expected))


def test_incompatible_dims_raise(mats):
    with pytest.raises(ValueError):
        sparse_matrix_multiply(mats["c"], mats["f"].T)


def test_symmetric_requires_square_output(mats):
    with pytest.raises(ValueError):
        sparse_matrix_multiply(mats["c"], mats["d"], symmetric=True)


def test_bad_output_format_raises(mats):
    with pytest.raises(ValueError):
        sparse_matrix_multiply(mats["a8"], mats["b8"], output_format="csc")


def test_bad_compute_full_matrix_raises(mats):
    with pytest.raises(ValueError):
        sparse_matrix_multiply(mats["a8"], mats["b8"], compute_full_matrix=7)


def test_imem_size_accepted(mats):
    # imem_size is a compat no-op tuning hint; any int value must be accepted.
    r = sparse_matrix_multiply(mats["a8"], mats["b8"], imem_size=42)
    assert np.allclose(r.toarray(), mats["a8"] @ mats["b8"])
    with pytest.raises(ValueError):
        sparse_matrix_multiply(mats["a8"], mats["b8"], imem_size="not-an-int")
