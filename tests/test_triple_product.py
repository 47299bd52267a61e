"""Triple-product differential test at the reference's published tolerances
(coverage parity with ``tests/test_basic.py``: 500x500 d=0.01,
rtol=1e-5/atol=1e-8, upper-triangle mask)."""

import numpy as np
from scipy.sparse import random as sparse_random

from sparse_matrix_mult_tpu import sparse_matrix_multiply


def test_triple_product_tolerances():
    a = sparse_random(500, 500, density=0.01, format="csr", random_state=21)
    b = sparse_random(500, 500, density=0.01, format="csr", random_state=22)

    result = sparse_matrix_multiply(a, b, use_triple_product=True, compute_full_matrix=0)
    oracle = ((a @ b) @ a.T).toarray()

    assert result.ndim == 2
    mask = np.triu(np.ones(result.shape, dtype=bool))
    assert np.allclose(result[mask], oracle[mask], rtol=1e-5, atol=1e-8)


def test_triple_product_rectangular_h():
    # H is m x n with m != n: C = H Q H^T is m x m.
    h = sparse_random(60, 90, density=0.1, format="csr", random_state=23)
    q = sparse_random(90, 90, density=0.1, format="csr", random_state=24)
    result = sparse_matrix_multiply(h, q, use_triple_product=True, compute_full_matrix=1)
    oracle = (h @ q @ h.T).toarray()
    expected = np.triu(oracle) + np.triu(oracle, 1).T
    assert result.shape == (60, 60)
    assert np.allclose(result, expected, rtol=1e-5, atol=1e-8)
