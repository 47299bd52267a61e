"""Differential tests for the scatter-free CSR <-> dense conversions."""

import numpy as np
import pytest
import scipy.sparse as sp

import jax.numpy as jnp

import sparse_matrix_mult_tpu as smm
from sparse_matrix_mult_tpu.ops.convert import (
    csr_row_ids,
    csr_to_dense,
    dense_to_csr,
)

CASES = [
    (1, 1, 1.0, 0),
    (7, 13, 0.3, 1),
    (64, 64, 0.1, 2),
    (100, 80, 0.05, 3),
    (333, 517, 0.02, 4),
    # Above the _SMALL fallback threshold -> exercises the shift network.
    (600, 600, 0.05, 5),
]


@pytest.mark.parametrize("m,n,d,seed", CASES)
def test_csr_to_dense(m, n, d, seed):
    A = sp.random(m, n, density=d, format="csr", random_state=seed)
    a = smm.from_scipy(A)
    np.testing.assert_allclose(np.asarray(csr_to_dense(a)), A.toarray())


@pytest.mark.parametrize("m,n,d,seed", CASES)
def test_dense_to_csr_roundtrip(m, n, d, seed):
    A = sp.random(m, n, density=d, format="csr", random_state=seed)
    cap = max(int(A.nnz), 1)
    c = dense_to_csr(jnp.asarray(A.toarray()), cap)
    back = smm.to_scipy(c)
    np.testing.assert_allclose(back.toarray(), A.toarray())
    assert int(np.asarray(c.indptr)[-1]) == A.nnz


def test_row_ids_matches_searchsorted():
    A = sp.random(700, 900, density=0.01, format="csr", random_state=9)
    a = smm.from_scipy(A)
    nnz = A.nnz
    got = np.asarray(csr_row_ids(a))[:nnz]
    exp = np.repeat(np.arange(700), np.diff(A.indptr))
    np.testing.assert_array_equal(got, exp)


def test_dense_to_csr_keep_mask_preserves_structural_zeros():
    dense = np.zeros((600, 600))
    dense[2, 3] = 5.0
    dense[2, 7] = 0.0  # structural zero under an explicit mask
    keep = np.zeros_like(dense, dtype=bool)
    keep[2, 3] = True
    keep[2, 7] = True
    c = dense_to_csr(jnp.asarray(dense), 16, keep=jnp.asarray(keep))
    assert int(np.asarray(c.indptr)[-1]) == 2
    np.testing.assert_array_equal(np.asarray(c.indices)[:2], [3, 7])
    np.testing.assert_allclose(np.asarray(c.values)[:2], [5.0, 0.0])


def test_empty_matrix():
    A = sp.csr_matrix((300, 700))
    a = smm.from_scipy(A)
    assert np.all(np.asarray(csr_to_dense(a)) == 0)
    c = dense_to_csr(jnp.zeros((300, 700)), 8)
    assert int(np.asarray(c.indptr)[-1]) == 0
