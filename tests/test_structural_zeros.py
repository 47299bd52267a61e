"""Structural-zero contract (round-3 verdict, weak #3).

Ground truth established this round: the reference's Gustavson workers keep
every TOUCHED output slot, including exact-zero accumulations
(``/root/reference/src/sparsework.cpp:73-110``), while modern scipy (1.17
here) PRUNES them in matmul.  Routes: native-host Gustavson and the ESC
engines keep Gustavson structure; the scipy small-problem host branch, dense
extraction, and BSR prune.  These tests pin the contract at the STRUCTURE
level (nnz + indices) -- invisible to every dense-form differential suite --
and verify ``config.keep_structure=True`` delivers reference-exact structure
on every sparse-output route.

Gustavson-structure oracle: the pattern of ``|A| @ |B|`` (no cancellation
can zero a touched slot), values from ``A @ B``.
"""

import numpy as np
import pytest
import scipy.sparse as sp

import sparse_matrix_mult_tpu as smm
from sparse_matrix_mult_tpu.config import get_config, set_config


@pytest.fixture
def restore_config():
    cfg = get_config()
    keys = (
        "keep_structure",
        "host_compute_limit",
        "esc_expand_limit",
        "binned_expand_limit",
        "dense_path_limit",
        "auto_calibrate_link",
        "link_fixed_s",
        "link_up_bytes_per_s",
        "link_down_bytes_per_s",
        "host_rate_base",
    )
    saved = {k: getattr(cfg, k) for k in keys}
    yield
    set_config(**saved)


def _force_device_link():
    """Pin link params so the cost model always prefers the device."""
    set_config(
        auto_calibrate_link=False,
        link_fixed_s=1e-9,
        link_up_bytes_per_s=1e15,
        link_down_bytes_per_s=1e15,
        host_rate_base=1.0,
    )


def _cancelling_pair(n=60, seed=3):
    """A @ B with exact cancellations: every A row holds +v and -v on an
    (even, odd) column pair whose B rows are identical."""
    rng = np.random.default_rng(seed)
    rows, cols, vals = [], [], []
    for i in range(n):
        for _ in range(3):
            j = int(rng.integers(0, n // 2)) * 2
            v = float(rng.standard_normal())
            rows += [i, i]
            cols += [j, j + 1]
            vals += [v, -v]
    a = sp.csr_matrix((vals, (rows, cols)), shape=(n, n))
    a.sum_duplicates()
    b_half = sp.random(n // 2, n, density=0.2, format="csr", random_state=seed + 1)
    b = sp.csr_matrix(np.repeat(b_half.toarray(), 2, axis=0))
    touched = (abs(a) @ abs(b)).tocsr()  # Gustavson structure oracle
    touched.sort_indices()
    pruned = (a @ b).tocsr()
    pruned.sort_indices()
    assert touched.nnz > pruned.nnz  # the contract is observable
    return a, b, touched, pruned


def _assert_gustavson(got, touched, dense_ref):
    assert got.nnz == touched.nnz, (got.nnz, touched.nnz)
    np.testing.assert_array_equal(got.indptr, touched.indptr)
    np.testing.assert_array_equal(got.indices, touched.indices)
    np.testing.assert_allclose(got.toarray(), dense_ref, rtol=1e-12, atol=1e-13)


def test_esc_route_keeps_gustavson_structure(restore_config):
    a, b, touched, pruned = _cancelling_pair()
    set_config(host_compute_limit=0, dense_path_limit=1)
    _force_device_link()
    got = smm.sparse_matrix_multiply(a, b)
    assert smm.get_last_route() in ("esc", "esc_windowed", "esc_binned")
    _assert_gustavson(got, touched, pruned.toarray())


def test_esc_chunked_route_keeps_gustavson_structure(restore_config):
    a, b, touched, pruned = _cancelling_pair()
    set_config(host_compute_limit=0, dense_path_limit=1, esc_expand_limit=64, binned_expand_limit=64)
    _force_device_link()
    got = smm.sparse_matrix_multiply(a, b)
    assert smm.get_last_route() == "esc_chunks"
    _assert_gustavson(got, touched, pruned.toarray())


def test_default_small_host_route_matches_scipy(restore_config):
    # Below the native crossover the default host route IS scipy: pruned
    # structure, documented.
    a, b, touched, pruned = _cancelling_pair()
    got = smm.sparse_matrix_multiply(a, b)
    assert smm.get_last_route() == "host"
    assert got.nnz == pruned.nnz
    np.testing.assert_array_equal(got.indices, pruned.indices)


def test_keep_structure_forces_native_gustavson_on_host_route(restore_config):
    from sparse_matrix_mult_tpu.utils.native import get_native

    if get_native() is None:
        pytest.skip("native host library unavailable")
    a, b, touched, pruned = _cancelling_pair()
    set_config(keep_structure=True)
    got = smm.sparse_matrix_multiply(a, b)
    assert smm.get_last_route() == "host"
    _assert_gustavson(got, touched, pruned.toarray())


def test_dense_route_prunes_exact_zeros(restore_config):
    # Pin the DOCUMENTED divergence of the dense-extraction route.
    a, b, touched, pruned = _cancelling_pair()
    set_config(host_compute_limit=0)
    _force_device_link()
    got = smm.sparse_matrix_multiply(a, b)
    assert smm.get_last_route() == "dense"
    assert got.nnz == pruned.nnz
    np.testing.assert_allclose(
        got.toarray(), pruned.toarray(), rtol=1e-12, atol=1e-13
    )


def test_keep_structure_overrides_dense_routing(restore_config):
    a, b, touched, pruned = _cancelling_pair()
    set_config(host_compute_limit=0, keep_structure=True)
    _force_device_link()
    got = smm.sparse_matrix_multiply(a, b)
    assert smm.get_last_route() in ("esc", "esc_windowed", "esc_binned", "esc_chunks")
    _assert_gustavson(got, touched, pruned.toarray())
