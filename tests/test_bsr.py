"""Differential tests for the BSR container and Pallas block-sparse SpGEMM.

On CPU the kernel runs in the Pallas interpreter (same program the TPU
compiles).  Oracle: scipy/numpy dense products.
"""

import numpy as np
import pytest
import scipy.sparse as sp

import jax.numpy as jnp

from sparse_matrix_mult_tpu.ops.pallas.bsr_spgemm import bsr_matmul_dense
from sparse_matrix_mult_tpu.types_bsr import (
    bsr_from_dense,
    bsr_from_scipy,
    bsr_to_dense,
)


def block_sparse(nbr, nbc, occ, b=128, seed=0, inner_density=0.3):
    r = np.random.default_rng(seed)
    mask = r.random((nbr, nbc)) < occ
    dense = np.zeros((nbr * b, nbc * b), np.float32)
    for i in range(nbr):
        for j in range(nbc):
            if mask[i, j]:
                blk = r.standard_normal((b, b)).astype(np.float32)
                blk *= r.random((b, b)) < inner_density
                dense[i * b : (i + 1) * b, j * b : (j + 1) * b] = blk
    return dense


CASES = [
    (3, 4, 0.5),
    (4, 4, 0.25),
    (2, 2, 0.0),  # empty matrix
    (5, 3, 1.0),  # fully dense blocks
]


@pytest.mark.parametrize("nbr,nbc,occ", CASES)
def test_bsr_matmul_matches_numpy(nbr, nbc, occ):
    ad = block_sparse(nbr, nbc, occ, seed=nbr * 10 + nbc)
    rng = np.random.default_rng(1)
    bd = rng.standard_normal((nbc * 128, 300)).astype(np.float32)

    a_bsr = bsr_from_scipy(sp.csr_matrix(ad), 128, dtype=jnp.float32)
    got = np.asarray(bsr_matmul_dense(a_bsr, jnp.asarray(bd)))
    ref = ad @ bd
    assert got.shape == ref.shape
    assert np.allclose(got, ref, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("nbr,nbc,occ", CASES)
def test_bsr_from_dense_roundtrip(nbr, nbc, occ):
    ad = block_sparse(nbr, nbc, occ, seed=nbr + nbc)
    cap = max(1, int((np.abs(ad).sum(axis=0) >= 0).size))  # loose
    cap = nbr * nbc  # exact upper bound on block count
    a2 = bsr_from_dense(jnp.asarray(ad), cap)
    assert np.allclose(np.asarray(bsr_to_dense(a2)), ad)


def test_bsr_nonmultiple_shape():
    """Logical shapes that are not multiples of the block edge."""
    rng = np.random.default_rng(2)
    ad = np.zeros((200, 300), np.float32)
    ad[:128, :128] = rng.standard_normal((128, 128)).astype(np.float32)
    ad[150, 250] = 3.0
    bd = rng.standard_normal((300, 190)).astype(np.float32)

    a_bsr = bsr_from_scipy(sp.csr_matrix(ad), 128, dtype=jnp.float32)
    assert a_bsr.shape == (200, 300)
    got = np.asarray(bsr_matmul_dense(a_bsr, jnp.asarray(bd)))
    assert got.shape == (200, 190)
    assert np.allclose(got, ad @ bd, rtol=1e-4, atol=1e-4)


def test_bsr_empty_block_rows_are_zero():
    ad = np.zeros((4 * 128, 2 * 128), np.float32)
    ad[2 * 128 : 3 * 128, :128] = 1.0  # only block-row 2 populated
    bd = np.ones((2 * 128, 128), np.float32)
    a_bsr = bsr_from_scipy(sp.csr_matrix(ad), 128, dtype=jnp.float32)
    got = np.asarray(bsr_matmul_dense(a_bsr, jnp.asarray(bd)))
    assert np.all(got[: 2 * 128] == 0)
    assert np.all(got[3 * 128 :] == 0)
    assert np.allclose(got, ad @ bd)


# ---------------------------------------------------------------------------
# API-level dispatch (round 2): block-structured operands route through the
# BSR kernel from sparse_matrix_multiply, no private imports needed.
# ---------------------------------------------------------------------------


@pytest.fixture
def forced_bsr():
    import sparse_matrix_mult_tpu as smm

    cfg = smm.get_config()
    saved = cfg.force_pallas_bsr
    smm.set_config(force_pallas_bsr=True)
    yield
    smm.set_config(force_pallas_bsr=saved)


@pytest.mark.parametrize("output_format", ["sparse", "dense"])
def test_api_routes_block_structured_to_bsr(forced_bsr, output_format):
    import sparse_matrix_mult_tpu as smm

    ad = block_sparse(3, 3, 0.3, seed=5)
    A = sp.csr_matrix(ad.astype(np.float64))
    B = sp.random(3 * 128, 3 * 128, density=0.05, format="csr", random_state=6)
    got = smm.sparse_matrix_multiply(A, B, output_format=output_format)
    assert smm.get_last_route() == "bsr"
    ref = (A @ B).toarray()
    if output_format == "sparse":
        got = got.toarray()
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-6)


def test_api_bsr_symmetric(forced_bsr):
    import sparse_matrix_mult_tpu as smm

    ad = block_sparse(3, 3, 0.4, seed=7)
    A = sp.csr_matrix(ad.astype(np.float64))
    B = sp.random(3 * 128, 3 * 128, density=0.05, format="csr", random_state=8)
    got = smm.sparse_matrix_multiply(A, B, symmetric=True)
    assert smm.get_last_route() == "bsr"
    np.testing.assert_allclose(
        got.toarray(), np.triu((A @ B).toarray()), rtol=1e-4, atol=1e-6
    )


def test_dense_route_without_force():
    """Occupancy above the cutoff (or CPU backend) never routes to BSR.

    (A problem this tiny routes to the host Gustavson escape hatch; the
    point here is only that unforced block-dense operands skip the BSR
    kernel.)
    """
    import sparse_matrix_mult_tpu as smm

    A = sp.random(64, 64, density=0.2, format="csr", random_state=9)
    B = sp.random(64, 64, density=0.2, format="csr", random_state=10)
    smm.sparse_matrix_multiply(A, B)
    assert smm.get_last_route() in ("dense", "host")


def test_block_occupancy_estimator():
    from sparse_matrix_mult_tpu.api import block_occupancy

    ad = np.zeros((256, 256))
    ad[:128, :128] = 1.0
    assert block_occupancy(sp.csr_matrix(ad), 128) == 0.25
    assert block_occupancy(sp.csr_matrix(np.zeros((256, 256))), 128) == 0.0
    assert block_occupancy(sp.csr_matrix(np.ones((256, 256))), 128) == 1.0


@pytest.mark.parametrize("nbr,nbk,nbc,occ_a,occ_b", [
    (3, 4, 3, 0.5, 0.4),
    (4, 3, 5, 0.25, 0.25),
    (2, 2, 2, 1.0, 1.0),
])
def test_bsr_bsr_matmul_matches_numpy(nbr, nbk, nbc, occ_a, occ_b):
    from sparse_matrix_mult_tpu.ops.pallas.bsr_spgemm import (
        bsr_bsr_matmul_dense,
        bsr_pair_plan,
    )

    ad = block_sparse(nbr, nbk, occ_a, seed=7 * nbr + nbk)
    bd = block_sparse(nbk, nbc, occ_b, seed=11 * nbk + nbc)
    a_sp, b_sp = sp.csr_matrix(ad), sp.csr_matrix(bd)
    plan = bsr_pair_plan(a_sp, b_sp, 128)
    if plan is None:
        assert (np.abs(ad).sum() == 0) or (np.abs(bd).sum() == 0)
        return
    a_bsr = bsr_from_scipy(a_sp, 128, dtype=jnp.float32)
    b_bsr = bsr_from_scipy(b_sp, 128, dtype=jnp.float32)
    got = np.asarray(
        bsr_bsr_matmul_dense(
            a_bsr,
            b_bsr,
            jnp.asarray(plan["pa"]),
            jnp.asarray(plan["pb"]),
            jnp.asarray(plan["ci"]),
            jnp.asarray(plan["cj"]),
            jnp.asarray(plan["first"]),
            jnp.asarray(plan["mask"]),
        )
    )
    ref = ad @ bd
    assert got.shape == ref.shape
    assert np.allclose(got, ref, rtol=1e-4, atol=1e-4)
    # Fewer MXU tile products than BSR x dense would run.
    assert plan["n_pairs"] <= plan["n_a_blocks"] * nbc


def test_bsr_bsr_nonmultiple_shapes():
    from sparse_matrix_mult_tpu.ops.pallas.bsr_spgemm import (
        bsr_bsr_matmul_dense,
        bsr_pair_plan,
    )

    rng = np.random.default_rng(5)
    ad = np.zeros((200, 300), np.float32)
    ad[:100, :130] = rng.standard_normal((100, 130)).astype(np.float32)
    bd = np.zeros((300, 250), np.float32)
    bd[:130, 128:] = rng.standard_normal((130, 122)).astype(np.float32)
    a_sp, b_sp = sp.csr_matrix(ad), sp.csr_matrix(bd)
    plan = bsr_pair_plan(a_sp, b_sp, 128)
    a_bsr = bsr_from_scipy(a_sp, 128, dtype=jnp.float32)
    b_bsr = bsr_from_scipy(b_sp, 128, dtype=jnp.float32)
    got = np.asarray(
        bsr_bsr_matmul_dense(
            a_bsr, b_bsr,
            jnp.asarray(plan["pa"]), jnp.asarray(plan["pb"]),
            jnp.asarray(plan["ci"]), jnp.asarray(plan["cj"]),
            jnp.asarray(plan["first"]), jnp.asarray(plan["mask"]),
        )
    )
    assert np.allclose(got, ad @ bd, rtol=1e-4, atol=1e-4)


def test_api_routes_bsr_bsr_when_both_block_sparse(forced_bsr):
    import sparse_matrix_mult_tpu as smm

    ad = block_sparse(4, 4, 0.25, seed=1)
    bd = block_sparse(4, 4, 0.25, seed=2)
    got = smm.sparse_matrix_multiply(
        sp.csr_matrix(ad), sp.csr_matrix(bd), output_format="dense"
    )
    assert smm.get_last_route() == "bsr"
    assert np.allclose(got, ad @ bd, rtol=1e-4, atol=1e-4)


def test_block_occupancy_cache():
    import sparse_matrix_mult_tpu.api as api

    m = sp.csr_matrix(block_sparse(3, 3, 0.5, seed=9))
    occ1 = api.block_occupancy(m, 128)
    assert (id(m), 128) in api._OCC_CACHE
    occ2 = api.block_occupancy(m, 128)
    assert occ1 == occ2
    # Mutating nnz invalidates the entry.
    m2 = m.copy()
    occ3 = api.block_occupancy(m2, 128)
    assert occ3 == occ1
