"""Unit tests for the device-resident CSR container and the jit-composable
device API (capabilities the reference has no analogue for)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.sparse import random as sparse_random

import sparse_matrix_mult_tpu as smt
from sparse_matrix_mult_tpu.ops.spgemm_jnp import expansion_size, spgemm_esc
from sparse_matrix_mult_tpu.types import bucket_capacity


def test_bucket_capacity():
    assert bucket_capacity(0) == 128
    assert bucket_capacity(128) == 128
    assert bucket_capacity(129) == 256
    assert bucket_capacity(1000) == 1024


def test_scipy_roundtrip():
    a = sparse_random(50, 70, density=0.1, format="csr", random_state=3)
    dev = smt.from_scipy(a)
    assert dev.shape == (50, 70)
    assert int(dev.nnz) == a.nnz
    back = smt.to_scipy(dev)
    assert np.allclose(back.toarray(), a.toarray())
    # Padding invariant: everything past nnz is zero.
    assert np.all(np.asarray(dev.values[a.nnz :]) == 0)
    assert np.all(np.asarray(dev.indices[a.nnz :]) == 0)


def test_todense_matches_scipy():
    a = sparse_random(30, 40, density=0.2, format="csr", random_state=4)
    dev = smt.from_scipy(a)
    assert np.allclose(np.asarray(dev.todense()), a.toarray())


def test_from_dense_roundtrip():
    rng = np.random.default_rng(5)
    d = rng.random((20, 30))
    d[d < 0.7] = 0.0
    nnz = int((d != 0).sum())
    dev = smt.from_dense(jnp.asarray(d), capacity=bucket_capacity(nnz))
    assert int(dev.nnz) == nnz
    assert np.allclose(np.asarray(dev.todense()), d)


def test_csrmatrix_is_pytree():
    a = smt.from_scipy(sparse_random(10, 10, density=0.3, format="csr", random_state=6))
    leaves = jax.tree_util.tree_leaves(a)
    assert len(leaves) == 3
    # jit through the container
    f = jax.jit(lambda m: m.todense().sum())
    _ = f(a)


def test_spgemm_esc_matches_scipy():
    a_sp = sparse_random(80, 60, density=0.15, format="csr", random_state=7)
    b_sp = sparse_random(60, 90, density=0.15, format="csr", random_state=8)
    a, b = smt.from_scipy(a_sp), smt.from_scipy(b_sp)
    expand = expansion_size(a_sp.indices, a_sp.nnz, b_sp.indptr)
    c = spgemm_esc(
        a,
        b,
        expand_capacity=bucket_capacity(expand),
        out_capacity=bucket_capacity(expand),
    )
    assert np.allclose(smt.to_scipy(c).toarray(), (a_sp @ b_sp).toarray())


def test_spgemm_esc_symmetric_upper_only():
    a_sp = sparse_random(50, 50, density=0.2, format="csr", random_state=9)
    b_sp = sparse_random(50, 50, density=0.2, format="csr", random_state=10)
    a, b = smt.from_scipy(a_sp), smt.from_scipy(b_sp)
    expand = expansion_size(a_sp.indices, a_sp.nnz, b_sp.indptr)
    c = spgemm_esc(
        a,
        b,
        expand_capacity=bucket_capacity(expand),
        out_capacity=bucket_capacity(expand),
        symmetric=True,
    )
    dense = smt.to_scipy(c).toarray()
    oracle = (a_sp @ b_sp).toarray()
    assert np.allclose(dense, np.triu(oracle))


def test_device_multiply_api_jit_composable():
    a_sp = sparse_random(40, 40, density=0.2, format="csr", random_state=11)
    b_sp = sparse_random(40, 40, density=0.2, format="csr", random_state=12)
    a, b = smt.from_scipy(a_sp), smt.from_scipy(b_sp)

    @jax.jit
    def f(a, b):
        return smt.multiply(a, b, output_format="dense")

    assert np.allclose(np.asarray(f(a, b)), (a_sp @ b_sp).toarray())


def test_device_triple_product():
    h_sp = sparse_random(30, 40, density=0.2, format="csr", random_state=13)
    q_sp = sparse_random(40, 40, density=0.2, format="csr", random_state=14)
    h, q = smt.from_scipy(h_sp), smt.from_scipy(q_sp)
    c = smt.triple_product(h, q, compute_full_matrix=0)
    oracle = (h_sp @ q_sp @ h_sp.T).toarray()
    assert np.allclose(np.asarray(c), np.triu(oracle))


def test_empty_container():
    import scipy.sparse as sp

    a = smt.from_scipy(sp.csr_matrix((5, 7)))
    assert int(a.nnz) == 0
    assert np.allclose(np.asarray(a.todense()), np.zeros((5, 7)))
