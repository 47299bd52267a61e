"""Multi-chip tests on the virtual 8-device CPU mesh.

The reference has no distributed layer (SURVEY.md section 2); these tests
cover the new ring-SpGEMM path: row-sharded A/C with B blocks rotating over
the mesh axis via ppermute.
"""

import numpy as np
import pytest
import scipy.sparse as sp

import jax
import jax.numpy as jnp

import sparse_matrix_mult_tpu as smm
from sparse_matrix_mult_tpu.parallel.distributed import (
    ShardedCSR,
    flop_shard_bounds,
    ring_matmul,
    shard_csr,
    spgemm_csr_distributed,
    spgemm_dense_distributed,
    triple_product_distributed,
)
from sparse_matrix_mult_tpu.parallel.mesh import row_mesh, row_sharding


@pytest.fixture(scope="module")
def mesh():
    if len(jax.devices()) < 2:
        pytest.skip("needs a multi-device platform")
    return row_mesh()


def test_ring_matmul_vs_dense(mesh):
    rng = np.random.default_rng(0)
    a = rng.standard_normal((100, 72))
    b = rng.standard_normal((72, 53))
    got = np.asarray(ring_matmul(jnp.asarray(a), jnp.asarray(b), mesh))
    np.testing.assert_allclose(got, a @ b, rtol=1e-10, atol=1e-12)


@pytest.mark.parametrize("m,k,n,d", [(64, 64, 64, 0.2), (100, 90, 110, 0.1)])
def test_distributed_spgemm(mesh, m, k, n, d):
    A = sp.random(m, k, density=d, format="csr", random_state=1)
    B = sp.random(k, n, density=d, format="csr", random_state=2)
    got = np.asarray(
        spgemm_dense_distributed(smm.from_scipy(A), smm.from_scipy(B), mesh=mesh)
    )
    np.testing.assert_allclose(got, (A @ B).toarray(), rtol=1e-10, atol=1e-12)


def test_distributed_spgemm_symmetric(mesh):
    A = sp.random(80, 80, density=0.1, format="csr", random_state=3)
    B = sp.random(80, 80, density=0.1, format="csr", random_state=4)
    got = np.asarray(
        spgemm_dense_distributed(
            smm.from_scipy(A), smm.from_scipy(B), symmetric=True, mesh=mesh
        )
    )
    np.testing.assert_allclose(
        got, np.triu((A @ B).toarray()), rtol=1e-10, atol=1e-12
    )


@pytest.mark.parametrize("full", [0, 1])
def test_distributed_triple_product(mesh, full):
    H = sp.random(60, 90, density=0.1, format="csr", random_state=5)
    Q = sp.random(90, 90, density=0.1, format="csr", random_state=6)
    got = np.asarray(
        triple_product_distributed(
            smm.from_scipy(H), smm.from_scipy(Q), compute_full_matrix=full, mesh=mesh
        )
    )
    ref = (H @ Q @ H.T).toarray()
    exp = np.triu(ref) + (np.triu(ref, 1).T if full else 0)
    np.testing.assert_allclose(got, exp, rtol=1e-10, atol=1e-12)


def test_output_sharding_is_row_partitioned(mesh):
    """The distributed product's output must actually be row-sharded."""
    A = sp.random(64, 64, density=0.2, format="csr", random_state=7)
    B = sp.random(64, 64, density=0.2, format="csr", random_state=8)
    out = spgemm_dense_distributed(smm.from_scipy(A), smm.from_scipy(B), mesh=mesh)
    shard_shapes = {s.data.shape for s in out.addressable_shards}
    n = mesh.devices.size
    assert len(out.addressable_shards) == n
    assert all(s[0] * n == out.shape[0] for s in shard_shapes)


@pytest.mark.parametrize(
    "m,k,c,density,symmetric",
    [(40, 30, 50, 0.3, False), (64, 64, 64, 0.1, True), (17, 23, 11, 0.5, False)],
)
def test_distributed_csr_output(mesh, m, k, c, density, symmetric):
    """Row-sharded packed-CSR product stitches back to the scipy oracle."""
    A = sp.random(m, k, density=density, format="csr", random_state=9)
    B = sp.random(k, c, density=density, format="csr", random_state=10)
    out = spgemm_csr_distributed(
        smm.from_scipy(A), smm.from_scipy(B), symmetric=symmetric, mesh=mesh
    )
    assert out.n_shards == mesh.devices.size
    got = out.to_scipy().toarray()
    ref = (A @ B).toarray()
    if symmetric:
        ref = np.triu(ref)
    np.testing.assert_allclose(got, ref, rtol=1e-10, atol=1e-12)


# ---------------------------------------------------------------------------
# Sharded-operand ingestion (round-2: densify per shard, no global dense B).
# ---------------------------------------------------------------------------


def test_shard_csr_roundtrip(mesh):
    A = sp.random(50, 37, density=0.2, format="csr", random_state=11)
    sh = shard_csr(A, mesh)
    assert sh.n_shards == mesh.devices.size
    np.testing.assert_allclose(sh.to_scipy().toarray(), A.toarray())


def test_shard_csr_inputs_are_actually_sharded(mesh):
    """Each device must hold exactly one 1/S block of each operand array."""
    S = mesh.devices.size
    A = sp.random(64, 64, density=0.2, format="csr", random_state=12)
    sh = shard_csr(A, mesh)
    for arr in (sh.indptrs, sh.indices, sh.values):
        shards = arr.addressable_shards
        assert len(shards) == S
        devs = set()
        for s in shards:
            assert s.data.shape[0] == 1  # one block, not a replica
            devs.add(s.device)
        assert len(devs) == S


def test_no_device_holds_full_dense_b(mesh):
    """The per-device working set must stay ~1/S: peak temp memory of the
    compiled distributed product is far below the full dense operand set
    (which is what round 1 materialized before sharding)."""
    S = mesh.devices.size
    m = k = n = 64 * S
    A = sp.random(m, k, density=0.1, format="csr", random_state=13)
    B = sp.random(k, n, density=0.1, format="csr", random_state=14)
    a, b = shard_csr(A, mesh), shard_csr(B, mesh)

    from sparse_matrix_mult_tpu.parallel.distributed import _spgemm_dense_jit

    compiled = _spgemm_dense_jit(mesh, False).lower(a, b).compile()
    mem = compiled.memory_analysis()
    itemsize = np.dtype(np.float64).itemsize if jax.config.jax_enable_x64 else 4
    full_dense_bytes = (m * k + k * n) * itemsize
    if mem is not None and getattr(mem, "temp_size_in_bytes", 0):
        # Per-device temporaries: local A block + local B block + C rows
        # + ring buffers; allow 4x slack but demand well under the global
        # dense footprint.
        assert mem.temp_size_in_bytes < full_dense_bytes
    out = compiled(a, b)
    np.testing.assert_allclose(
        np.asarray(out), (A @ B).toarray(), rtol=1e-10, atol=1e-8
    )


def test_flop_balanced_shard_bounds(mesh):
    """Skewed matrices get skew-aware bounds, and results stay exact."""
    S = mesh.devices.size
    m, k, n = 80, 60, 40
    A = sp.random(m, k, density=0.05, format="csr", random_state=15).tolil()
    A[0, :] = 1.0  # one heavy row
    A = A.tocsr()
    B = sp.random(k, n, density=0.3, format="csr", random_state=16)
    bounds = flop_shard_bounds(A, B, S)
    assert len(bounds) == S + 1 and bounds[0] == 0 and bounds[-1] == m
    # The heavy first row should land in a narrower-than-uniform first shard.
    assert bounds[1] <= -(-m // S)
    out = spgemm_csr_distributed(A, B, mesh=mesh, balance="flops")
    assert out.bounds == bounds
    np.testing.assert_allclose(
        out.to_scipy().toarray(), (A @ B).toarray(), rtol=1e-10, atol=1e-12
    )


def test_sharded_operands_accepted_everywhere(mesh):
    """ShardedCSR operands flow through all three distributed entry points."""
    A = sp.random(48, 48, density=0.2, format="csr", random_state=17)
    B = sp.random(48, 48, density=0.2, format="csr", random_state=18)
    a, b = shard_csr(A, mesh), shard_csr(B, mesh)
    ref = (A @ B).toarray()
    np.testing.assert_allclose(
        np.asarray(spgemm_dense_distributed(a, b, mesh=mesh)), ref,
        rtol=1e-10, atol=1e-12,
    )
    np.testing.assert_allclose(
        spgemm_csr_distributed(a, b, mesh=mesh).to_scipy().toarray(), ref,
        rtol=1e-10, atol=1e-12,
    )
    tp = triple_product_distributed(a, b, compute_full_matrix=1, mesh=mesh)
    # Reference contract: the full matrix is the upper triangle mirrored
    # (sparse_sparse_dense.cpp:213-215), regardless of Q's symmetry.
    ref_tp = (A @ B @ A.T).toarray()
    exp = np.triu(ref_tp) + np.triu(ref_tp, 1).T
    np.testing.assert_allclose(np.asarray(tp), exp, rtol=1e-10, atol=1e-8)
