"""Distributed SpGEMM with sparse local contraction (no densification).

Round-2 review item 2: the densifying distributed path caps the mesh at
problems whose dense shard panels fit per-chip memory.  These tests drive
:func:`spgemm_csr_distributed_sparse` on the virtual 8-device CPU mesh,
including a problem whose dense shard panels would blow a set per-device
budget -- the regime the reference's shared-B OpenMP workers cover in host
RAM (``/root/reference/src/sparse_sparse_sparse.cpp:228-241``) and SURVEY
section 5 targets across a mesh.
"""

import jax
import numpy as np
import pytest
import scipy.sparse as sp

from sparse_matrix_mult_tpu.parallel.distributed import (
    _expand_step_capacity,
    _spgemm_sparse_jit,
    _uniform_bounds,
    flop_shard_bounds,
    shard_csr,
    spgemm_csr_distributed_sparse,
)
from sparse_matrix_mult_tpu.parallel.mesh import row_mesh
from sparse_matrix_mult_tpu.types import bucket_capacity


@pytest.fixture(scope="module")
def mesh():
    return row_mesh()


@pytest.mark.parametrize("symmetric", [False, True])
@pytest.mark.parametrize("balance", ["rows", "flops"])
def test_sparse_ring_matches_scipy(mesh, symmetric, balance):
    m = k = n = 300
    A = sp.random(m, k, density=0.02, format="csr", random_state=21)
    B = sp.random(k, n, density=0.02, format="csr", random_state=22)
    out = spgemm_csr_distributed_sparse(
        A, B, mesh=mesh, symmetric=symmetric, balance=balance
    )
    got = out.to_scipy().toarray()
    ref = (A @ B).toarray()
    if symmetric:
        ref = np.triu(ref)
    np.testing.assert_allclose(got, ref, rtol=1e-10, atol=1e-12)


def test_bidirectional_ring_odd_mesh():
    """5-device sub-mesh: odd ring size exercises the gated final
    counter-clockwise step of the bidirectional ring (round 5)."""
    from jax.sharding import Mesh

    mesh5 = Mesh(np.array(jax.devices()[:5]), ("rows",))
    m = k = n = 220
    A = sp.random(m, k, density=0.04, format="csr", random_state=71)
    B = sp.random(k, n, density=0.04, format="csr", random_state=72)
    for symmetric in (False, True):
        out = spgemm_csr_distributed_sparse(A, B, mesh=mesh5, symmetric=symmetric)
        ref = (A @ B).toarray()
        if symmetric:
            ref = np.triu(ref)
        np.testing.assert_allclose(
            out.to_scipy().toarray(), ref, rtol=1e-10, atol=1e-12
        )


def test_bidirectional_ring_two_devices():
    """S=2 degenerates to a single exchange (one loop step, both streams)."""
    from jax.sharding import Mesh

    mesh2 = Mesh(np.array(jax.devices()[:2]), ("rows",))
    A = sp.random(100, 80, density=0.05, format="csr", random_state=73)
    B = sp.random(80, 120, density=0.05, format="csr", random_state=74)
    out = spgemm_csr_distributed_sparse(A, B, mesh=mesh2)
    np.testing.assert_allclose(
        out.to_scipy().toarray(), (A @ B).toarray(), rtol=1e-10, atol=1e-12
    )


def test_skew_robust_partials_buffer(mesh):
    """VERDICT r4 item 4: a power-law/skewed problem where the old
    ``S x e_step`` sizing would allocate >= 8x the per-shard work must now
    run with <= ~2x (cumulative-offset append sized by per-shard totals),
    and stay exact.

    Construction: every A column points at B block 0 for most shards, but
    shard 0's rows also reference ONE B row with a huge nnz -- a single
    heavy (shard, block) pair.
    """
    from sparse_matrix_mult_tpu.utils.transfer import fine_capacity

    S = mesh.devices.size
    m = k = n = 800
    rng = np.random.default_rng(5)
    # Background: ~8 entries per row into random columns.
    rows = np.repeat(np.arange(m), 8)
    cols = rng.integers(0, k, rows.size)
    vals = rng.standard_normal(rows.size)
    # Heavy coupling: shard-0 rows hit column 0...
    heavy_rows = np.arange(0, m // S)
    rows = np.concatenate([rows, heavy_rows])
    cols = np.concatenate([cols, np.zeros(heavy_rows.size, np.int64)])
    vals = np.concatenate([vals, rng.standard_normal(heavy_rows.size)])
    A = sp.coo_matrix((vals, (rows, cols)), shape=(m, k)).tocsr()
    # ...and B row 0 is fully dense (the heavy block), rest moderate.
    B = sp.random(k, n, density=0.03, format="csr", random_state=6).tolil()
    B[0, :] = rng.standard_normal(n)
    B = B.tocsr()

    bounds = tuple(np.linspace(0, m, S + 1).astype(int))
    e_max, tot_max = _expand_step_capacity(A, B.indptr, B.shape[0], bounds, S)
    old_sizing = S * bucket_capacity(e_max)
    new_sizing = fine_capacity(tot_max) + fine_capacity(e_max)
    assert old_sizing >= 8 * tot_max, (old_sizing, tot_max)
    assert new_sizing <= 2 * tot_max, (new_sizing, tot_max)

    out = spgemm_csr_distributed_sparse(A, B, mesh=mesh, balance="rows")
    np.testing.assert_allclose(
        out.to_scipy().toarray(), (A @ B).toarray(), rtol=1e-10, atol=1e-12
    )


def test_sparse_ring_nonsquare_and_skew(mesh):
    m, k, n = 250, 170, 410
    A = sp.random(m, k, density=0.03, format="csr", random_state=23).tolil()
    A[0, :] = 1.0  # heavy row -> exercises per-step capacity skew
    A = A.tocsr()
    B = sp.random(k, n, density=0.05, format="csr", random_state=24)
    out = spgemm_csr_distributed_sparse(A, B, mesh=mesh, balance="flops")
    np.testing.assert_allclose(
        out.to_scipy().toarray(), (A @ B).toarray(), rtol=1e-10, atol=1e-12
    )


def test_sparse_ring_empty_shards(mesh):
    """Rows concentrated in the first shard; later shards see zero work."""
    m = k = n = 64
    A = sp.csr_matrix((np.ones(3), np.array([1, 2, 3]),
                       np.concatenate([[0, 1, 2, 3], np.full(m - 3, 3)])),
                      shape=(m, k))
    B = sp.random(k, n, density=0.1, format="csr", random_state=25)
    out = spgemm_csr_distributed_sparse(A, B, mesh=mesh)
    np.testing.assert_allclose(
        out.to_scipy().toarray(), (A @ B).toarray(), rtol=1e-10, atol=1e-12
    )


def test_auto_dispatch_to_sparse_engine(mesh, monkeypatch):
    """spgemm_csr_distributed hands off to the sparse engine when the dense
    shard working set exceeds Config.dense_shard_budget_bytes."""
    import sparse_matrix_mult_tpu.parallel.distributed as dist
    from sparse_matrix_mult_tpu.config import get_config, set_config

    A = sp.random(200, 200, density=0.05, format="csr", random_state=31)
    B = sp.random(200, 200, density=0.05, format="csr", random_state=32)
    calls = []
    real = dist.spgemm_csr_distributed_sparse

    def spy(*args, **kw):
        calls.append(1)
        return real(*args, **kw)

    monkeypatch.setattr(dist, "spgemm_csr_distributed_sparse", spy)
    old = get_config()
    try:
        set_config(dense_shard_budget_bytes=1 << 10)  # force handoff
        out = dist.spgemm_csr_distributed(A, B, mesh=mesh)
        assert calls, "sparse engine was not dispatched"
        np.testing.assert_allclose(
            out.to_scipy().toarray(), (A @ B).toarray(), rtol=1e-10, atol=1e-12
        )
        calls.clear()
        set_config(dense_shard_budget_bytes=4 << 30)
        out = dist.spgemm_csr_distributed(A, B, mesh=mesh)
        assert not calls, "small problem should stay on the dense path"
    finally:
        set_config(old)


def test_expand_step_capacity_exact(mesh):
    S = mesh.devices.size
    A = sp.random(100, 80, density=0.1, format="csr", random_state=26)
    B = sp.random(80, 90, density=0.1, format="csr", random_state=27)
    bounds = _uniform_bounds(100, S)
    e_max, tot_max = _expand_step_capacity(A, B.indptr, B.shape[0], bounds, S)
    # Exact totals: sum over shards of per-shard totals == global expansion.
    kb = -(-80 // S)
    b_row_nnz = np.diff(B.indptr)
    total = int(b_row_nnz[A.indices].sum())
    assert tot_max <= total
    assert e_max <= tot_max
    # Brute-force the max step size.
    brute = 0
    for s in range(S):
        lo, hi = A.indptr[bounds[s]], A.indptr[bounds[s + 1]]
        cols = A.indices[lo:hi]
        for j in range(S):
            in_blk = (cols >= j * kb) & (cols < (j + 1) * kb)
            brute = max(brute, int(b_row_nnz[cols[in_blk]].sum()))
    assert e_max == brute


def test_large_sparse_never_densifies(mesh):
    """A problem whose dense shard panels exceed a hard per-device budget.

    20k x 20k at d=5e-4: each dense shard panel would be
    (20000/8) x 20000 = 50M elements = 400 MB (f64) per operand per device
    -- set the budget at 64 MB and assert the compiled sparse-ring program's
    per-device temporaries stay under it, then check exactness vs scipy.
    """
    S = mesh.devices.size
    m = k = n = 20_000

    from sparse_matrix_mult_tpu.utils.testing import hypersparse_random

    nnz = int(5e-4 * m * k)
    A = hypersparse_random(m, k, nnz, seed=28)
    B = hypersparse_random(k, n, nnz, seed=29)
    bounds = flop_shard_bounds(A, B, S)
    e_max, tot_max = _expand_step_capacity(A, B.indptr, B.shape[0], bounds, S)
    e_step = bucket_capacity(e_max)
    cap_l = bucket_capacity(tot_max)
    a = shard_csr(A, row_mesh(), bounds=bounds)
    b = shard_csr(B, row_mesh())
    fn = _spgemm_sparse_jit(mesh, False, e_step, cap_l, bucket_capacity(tot_max) + e_step)
    compiled = fn.lower(a, b).compile()
    mem = compiled.memory_analysis()
    budget = 64 << 20
    dense_panel_bytes = (m // S) * n * (8 if jax.config.jax_enable_x64 else 4)
    assert dense_panel_bytes > budget  # the dense path could not fit
    if mem is not None and getattr(mem, "temp_size_in_bytes", 0):
        assert mem.temp_size_in_bytes < budget
    out = spgemm_csr_distributed_sparse(
        A, B, mesh=mesh, expand_step_capacity=None, shard_capacity=None
    )
    ref = A @ B
    got = out.to_scipy()
    assert got.nnz == ref.nnz
    diff = np.abs((got - ref)).max()
    assert diff < 1e-10


def test_fewer_rows_than_devices_flop_balance(mesh):
    # flop_balanced_partition returns min(parts, rows)+1 boundaries; with
    # m < mesh size the trailing shards must be created empty instead of
    # failing shard_csr's bounds validation (round-3 ADVICE finding).
    a = sp.random(5, 64, density=0.5, format="csr", random_state=11)
    b = sp.random(64, 32, density=0.2, format="csr", random_state=12)
    out = spgemm_csr_distributed_sparse(a, b, mesh=mesh, balance="flops")
    np.testing.assert_allclose(
        out.to_scipy().toarray(), (a @ b).toarray(), rtol=1e-10, atol=1e-12
    )


def test_sparse_triple_product_matches_scipy(mesh):
    from sparse_matrix_mult_tpu.parallel.distributed import (
        triple_product_distributed_sparse,
    )

    H = sp.random(60, 200, density=0.05, format="csr", random_state=41)
    Q = sp.random(200, 200, density=0.05, format="csr", random_state=42)
    ref = (H @ Q @ H.T).toarray()
    upper = np.asarray(triple_product_distributed_sparse(H, Q, 0, mesh=mesh))
    np.testing.assert_allclose(upper, np.triu(ref), rtol=1e-10, atol=1e-12)
    full = np.asarray(triple_product_distributed_sparse(H, Q, 1, mesh=mesh))
    np.testing.assert_allclose(full, ref, rtol=1e-10, atol=1e-12)


def test_triple_product_auto_dispatches_to_sparse(mesh):
    from sparse_matrix_mult_tpu.config import get_config, set_config
    from sparse_matrix_mult_tpu.parallel.distributed import (
        triple_product_distributed,
    )

    H = sp.random(40, 160, density=0.05, format="csr", random_state=43)
    Q = sp.random(160, 160, density=0.05, format="csr", random_state=44)
    ref = np.triu((H @ Q @ H.T).toarray())
    saved = get_config().dense_shard_budget_bytes
    try:
        # Big enough for the (5 x 40) C panel, far too small for the dense
        # (5 x 160) H/Q/T panels: must take the sparse path.
        set_config(dense_shard_budget_bytes=40 * 40 * 8)
        got = np.asarray(triple_product_distributed(H, Q, 0, mesh=mesh))
    finally:
        set_config(dense_shard_budget_bytes=saved)
    np.testing.assert_allclose(got, ref, rtol=1e-10, atol=1e-12)


def test_sparse_triple_product_never_densifies(mesh):
    """SURVEY section-5-shaped H/Q: dense shard panels would blow a 64 MB
    per-device budget; the sparse triple product's compiled program must
    stay under it and match scipy."""
    from sparse_matrix_mult_tpu.parallel.distributed import (
        _triple_count_jit,
        _triple_sparse_jit,
        spgemm_csr_distributed_sparse,
    )
    from sparse_matrix_mult_tpu.utils.testing import hypersparse_random

    S = mesh.devices.size
    m, k = 2000, 40_000
    H = hypersparse_random(m, k, 20_000, seed=31)
    Q = hypersparse_random(k, k, 40_000, seed=32)
    budget = 64 << 20
    itemsize = 8 if jax.config.jax_enable_x64 else 4
    dense_h_panel = (m // S) * k * itemsize
    assert dense_h_panel * 2 > budget  # the dense path could not fit H+T

    t = spgemm_csr_distributed_sparse(H, Q, mesh=mesh, balance="rows")
    ht_sp = H.T.tocsr()
    ht = shard_csr(ht_sp, row_mesh())
    kb = ht.rows_pad
    nnzht = np.zeros(S * kb, np.int32)
    nnzht[:k] = np.diff(ht_sp.indptr)
    import jax.numpy as jnp

    counts = np.asarray(_triple_count_jit(mesh)(t.indptrs, t.indices, jnp.asarray(nnzht)))
    e_step = bucket_capacity(max(int(counts.max()), 1))
    fn = _triple_sparse_jit(mesh, e_step, False)
    compiled = fn.lower(t, ht).compile()
    mem = compiled.memory_analysis()
    if mem is not None and getattr(mem, "temp_size_in_bytes", 0):
        assert mem.temp_size_in_bytes < budget
    got = np.asarray(fn(t, ht))
    ref = np.triu((H @ Q @ H.T).toarray())
    np.testing.assert_allclose(got, ref, rtol=1e-10, atol=1e-10)


def test_sparse_triple_product_budget_gate(mesh):
    from sparse_matrix_mult_tpu.config import get_config, set_config
    from sparse_matrix_mult_tpu.parallel.distributed import (
        triple_product_distributed_sparse,
    )

    H = sp.random(64, 64, density=0.1, format="csr", random_state=45)
    saved = get_config().dense_shard_budget_bytes
    try:
        set_config(dense_shard_budget_bytes=16)
        with pytest.raises(ValueError, match="dense_shard_budget_bytes"):
            triple_product_distributed_sparse(H, H, 0, mesh=mesh)
    finally:
        set_config(dense_shard_budget_bytes=saved)
