"""Windowed (ELLPACK) ESC engine: differential tests vs scipy.

The windowed expansion (``ops/spgemm_jnp.py::spgemm_esc_windowed``) replaces
the per-partial gathers of the classic ESC with one ELLPACK row gather per A
entry, spilling long B rows into a tail expansion.  These tests force every
branch: no-tail, tail, pathological duplicate runs (the ``lax.cond`` scatter
fallback in ``esc_sort_compress``), the symmetric filter with a row offset,
and the two-key sort for output spaces past int32.  Oracle: scipy, exact in
f64 on CPU (reference test strategy: ``/root/reference/tests/``).
"""

import numpy as np
import pytest
import scipy.sparse as sp

import jax.numpy as jnp

import sparse_matrix_mult_tpu as smm
from sparse_matrix_mult_tpu.ops.spgemm_jnp import (
    expansion_size,
    spgemm_esc_windowed,
    windowed_plan,
)
from sparse_matrix_mult_tpu.types import bucket_capacity, from_scipy, to_scipy


def _run(a_sp, b_sp, window, symmetric=False, dtype=None, row_offset=0,
         tail=None, expand=None):
    expand_exact = expansion_size(a_sp.indices, a_sp.nnz, b_sp.indptr)
    if expand is None:
        expand = max(expand_exact, 1)
    lens = np.diff(b_sp.indptr)[a_sp.indices]
    if tail is None:
        tail = int(np.maximum(lens - window, 0).sum())
    a = from_scipy(a_sp, dtype=dtype)
    b = from_scipy(b_sp, dtype=dtype)
    out_cap = bucket_capacity(max(min(expand_exact, a_sp.shape[0] * b_sp.shape[1]), 1))
    c = spgemm_esc_windowed(
        a,
        b,
        window=window,
        expand_capacity=bucket_capacity(expand),
        tail_capacity=bucket_capacity(tail) if tail else 0,
        out_capacity=out_cap,
        symmetric=symmetric,
        row_offset=jnp.int32(row_offset),
    )
    return to_scipy(c)


def _check(a_sp, b_sp, window, symmetric=False, dtype=None, **kw):
    got = _run(a_sp, b_sp, window, symmetric=symmetric, dtype=dtype, **kw)
    ref = (a_sp @ b_sp).toarray()
    if symmetric:
        ref = np.triu(ref)
    # f64: duplicate runs past length 3 sum with doubling association, so
    # parity with scipy's left-fold is ulp-level, not bit-exact; 1e-12 is
    # seven orders tighter than the reference oracle (rtol=1e-5, atol=1e-8).
    tol = (
        dict(rtol=1e-5, atol=1e-8)
        if dtype == jnp.float32
        else dict(rtol=1e-12, atol=1e-14)
    )
    np.testing.assert_allclose(got.toarray(), ref, **tol)
    # Structure parity too: Gustavson keeps cancellation zeros; ESC must
    # match scipy's nnz pattern exactly (no silent drops).
    ref_sp = a_sp @ b_sp
    ref_sp.sort_indices()
    if symmetric:
        ref_sp = sp.triu(ref_sp, format="csr")
    if dtype != jnp.float32:
        assert got.nnz == ref_sp.nnz
        np.testing.assert_array_equal(got.indices, ref_sp.indices)
        np.testing.assert_array_equal(got.indptr, ref_sp.indptr)


def _pair(m, k, n, da, db, seed=0):
    rng = np.random.default_rng(seed)
    a = sp.random(m, k, density=da, format="csr", random_state=rng.integers(2**31))
    b = sp.random(k, n, density=db, format="csr", random_state=rng.integers(2**31))
    return a, b


def test_no_tail_window_covers_all():
    a, b = _pair(300, 300, 300, 0.01, 0.01, seed=1)
    assert np.diff(b.indptr).max() <= 16
    _check(a, b, window=16, tail=0)


def test_tail_engaged():
    # Skewed B: a few heavy rows spill past the window.
    a, b = _pair(200, 200, 200, 0.02, 0.02, seed=2)
    heavy = sp.random(1, 200, density=0.6, format="csr", random_state=7)
    b = sp.vstack([heavy, b[1:]], format="csr")
    assert np.diff(b.indptr).max() > 8
    _check(a, b, window=8)


def test_all_rows_overflow():
    # window smaller than every B row: everything rides the tail machinery.
    a, b = _pair(100, 100, 100, 0.05, 0.15, seed=3)
    _check(a, b, window=4)


def test_duplicate_long_runs_trigger_scatter_fallback():
    # One hot output cell accumulating hundreds of partials: run length far
    # past the shifted-add span forces the lax.cond scatter branch.
    m = 50
    a = sp.csr_matrix(np.ones((m, m)))
    b = sp.csr_matrix(np.ones((m, 1)))
    _check(a, b, window=1)
    _check(a, b, window=2)


def test_symmetric_filter():
    a, b = _pair(150, 150, 150, 0.03, 0.03, seed=4)
    _check(a, b, window=8, symmetric=True)


def test_symmetric_row_offset():
    # Chunked callers pass a global row offset; the filter must use it.
    import jax

    a, b = _pair(60, 80, 60, 0.05, 0.05, seed=5)
    got = _run(a, b, window=8, symmetric=True, row_offset=10)
    ref = np.asarray((a @ b).toarray())
    mask = np.arange(60)[None, :] >= (np.arange(60) + 10)[:, None]
    exact = jax.default_backend() == "cpu" and jax.config.jax_enable_x64
    tol = dict(rtol=0, atol=0) if exact else dict(rtol=1e-5, atol=1e-8)
    np.testing.assert_allclose(got.toarray(), ref * mask, **tol)


def test_two_key_large_output_space():
    # rows * cols >= 2**31: the fused int32 key is impossible; two-key path.
    m = 70000
    rng = np.random.default_rng(6)
    nnz = 4000
    a = sp.coo_matrix(
        (rng.standard_normal(nnz), (rng.integers(0, m, nnz), rng.integers(0, m, nnz))),
        shape=(m, m),
    ).tocsr()
    a.sum_duplicates()
    a.sort_indices()
    assert m * m >= 2**31
    import jax

    got = _run(a, a, window=8)
    ref = a @ a
    ref.sort_indices()
    diff = abs(got - ref).max()
    if jax.default_backend() == "cpu" and jax.config.jax_enable_x64:
        assert diff == 0
    else:
        assert diff < 1e-5  # f32 pipeline on accelerators


def test_f32_policy_dtype():
    a, b = _pair(200, 200, 200, 0.02, 0.02, seed=8)
    _check(a, b, window=8, dtype=jnp.float32)


def test_empty_rows_and_tiny():
    a = sp.csr_matrix((5, 5))
    a[0, 1] = 2.0
    a = a.tocsr()
    b = sp.identity(5, format="csr")
    _check(a, b, window=2, tail=0)


def test_windowed_plan():
    a, b = _pair(300, 300, 300, 0.01, 0.01, seed=9)
    lens = np.diff(b.indptr)[a.indices]
    e = expansion_size(a.indices, a.nnz, b.indptr)
    plan = windowed_plan(a.nnz, lens, e)
    assert plan is not None
    w, tail = plan
    assert w in (4, 8, 16, 32, 64)
    assert a.nnz * w + tail <= max(2.5 * e, e + 4096)
    # Long-row B: no window qualifies.
    dense_b = sp.csr_matrix(np.ones((50, 500)))
    a2 = sp.identity(50, format="csr").tocsr()
    lens2 = np.diff(dense_b.indptr)[a2.indices]
    e2 = expansion_size(a2.indices, a2.nnz, dense_b.indptr)
    assert windowed_plan(a2.nnz, lens2, e2) is None


@pytest.mark.parametrize("seed", range(6))
def test_windowed_vs_classic_property_sweep(seed):
    """Property sweep: for random shapes/densities/windows the windowed and
    classic engines must agree exactly with each other (same algorithmic
    result, different expansion machinery) and with scipy's structure."""
    from sparse_matrix_mult_tpu.ops.spgemm_jnp import spgemm_esc

    rng = np.random.default_rng(100 + seed)
    m = int(rng.integers(20, 250))
    k = int(rng.integers(20, 250))
    n = int(rng.integers(20, 250))
    da = float(rng.uniform(0.005, 0.12))
    db = float(rng.uniform(0.005, 0.12))
    window = int(rng.choice([2, 4, 8, 16]))
    symmetric = bool(rng.integers(0, 2)) and m == n
    a_sp = sp.random(m, k, density=da, format="csr", random_state=int(rng.integers(2**31)))
    b_sp = sp.random(k, n, density=db, format="csr", random_state=int(rng.integers(2**31)))
    e = expansion_size(a_sp.indices, a_sp.nnz, b_sp.indptr)
    if e == 0:
        return
    lens = np.diff(b_sp.indptr)[a_sp.indices]
    tail = int(np.maximum(lens - window, 0).sum())
    a = from_scipy(a_sp)
    b = from_scipy(b_sp)
    out_cap = bucket_capacity(max(min(e, m * n), 1))
    cw = to_scipy(
        spgemm_esc_windowed(
            a, b, window=window, expand_capacity=bucket_capacity(e),
            tail_capacity=bucket_capacity(tail) if tail else 0,
            out_capacity=out_cap, symmetric=symmetric,
        )
    )
    cc = to_scipy(
        spgemm_esc(
            a, b, expand_capacity=bucket_capacity(e), out_capacity=out_cap,
            symmetric=symmetric,
        )
    )
    assert cw.nnz == cc.nnz
    np.testing.assert_array_equal(cw.indices, cc.indices)
    np.testing.assert_array_equal(cw.indptr, cc.indptr)
    np.testing.assert_allclose(cw.toarray(), cc.toarray(), rtol=1e-12, atol=1e-14)
    ref = a_sp @ b_sp
    if symmetric:
        ref = sp.triu(ref, format="csr")
    ref.sort_indices()
    assert cw.nnz == ref.nnz
    np.testing.assert_allclose(cw.toarray(), ref.toarray(), rtol=1e-12, atol=1e-13)


def test_precomputed_window_table_matches_inline():
    from sparse_matrix_mult_tpu.ops.spgemm_jnp import precompute_window_table

    a_sp, b_sp = _pair(200, 200, 200, 0.02, 0.02, seed=17)
    a = from_scipy(a_sp, dtype=jnp.float32)
    b = from_scipy(b_sp, dtype=jnp.float32)
    e = expansion_size(a_sp.indices, a_sp.nnz, b_sp.indptr)
    lens = np.diff(b_sp.indptr)[a_sp.indices]
    tail = int(np.maximum(lens - 8, 0).sum())
    kw = dict(
        window=8,
        expand_capacity=bucket_capacity(max(e, 1)),
        tail_capacity=bucket_capacity(tail) if tail else 0,
        out_capacity=bucket_capacity(max(e, 1)),
    )
    tbl = precompute_window_table(b, 8)
    c1 = to_scipy(spgemm_esc_windowed(a, b, **kw))
    c2 = to_scipy(spgemm_esc_windowed(a, b, b_table=tbl, **kw))
    assert (abs(c1 - c2)).max() == 0
    assert c1.nnz == c2.nnz
    with pytest.raises(ValueError, match="b_table shape"):
        spgemm_esc_windowed(a, b, b_table=tbl[:, :-1], **kw)


def test_multiply_device_native_windowed_route():
    """Device-native multiply() takes the windowed engine via window=/
    tail_capacity= and matches the default ESC result exactly."""
    a_sp, b_sp = _pair(150, 150, 150, 0.03, 0.03, seed=21)
    a = from_scipy(a_sp)
    b = from_scipy(b_sp)
    e = expansion_size(a_sp.indices, a_sp.nnz, b_sp.indptr)
    lens = np.diff(b_sp.indptr)[a_sp.indices]
    tail = int(np.maximum(lens - 8, 0).sum())
    kw = dict(
        out_capacity=bucket_capacity(max(e, 1)),
        expand_capacity=bucket_capacity(max(e, 1)),
    )
    c1 = to_scipy(smm.multiply(a, b, **kw))
    c2 = to_scipy(
        smm.multiply(
            a, b, window=8,
            tail_capacity=bucket_capacity(tail) if tail else 0, **kw,
        )
    )
    assert c1.nnz == c2.nnz
    np.testing.assert_array_equal(c1.indices, c2.indices)
    np.testing.assert_allclose(c1.toarray(), c2.toarray(), rtol=1e-12, atol=1e-14)
    np.testing.assert_allclose(
        c2.toarray(), (a_sp @ b_sp).toarray(), rtol=1e-12, atol=1e-13
    )
