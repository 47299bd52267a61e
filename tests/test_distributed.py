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
    ring_matmul,
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
    from sparse_matrix_mult_tpu.parallel.distributed import spgemm_csr_distributed

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
