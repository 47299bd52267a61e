"""Checkpoint/resume round-trips (io.py).

The reference has no persistence layer (SURVEY section 5); these tests cover
the new save/load subsystem: exact scipy round-trips, device round-trips,
flop-balanced partitioned saves, subset loading, and stitched reassembly.
"""

import numpy as np
import pytest
import scipy.sparse as sp

import sparse_matrix_mult_tpu as smm
from sparse_matrix_mult_tpu.io import (
    load_csr,
    load_partitioned,
    load_sharded_result,
    save_csr,
    save_partitioned,
)


@pytest.fixture
def mat():
    return sp.random(97, 53, density=0.15, format="csr", random_state=7)


def test_save_load_scipy_roundtrip(tmp_path, mat):
    path = str(tmp_path / "m.npz")
    save_csr(path, mat)
    back = load_csr(path)
    assert back.shape == mat.shape
    assert np.array_equal(back.indptr, mat.indptr)
    assert np.array_equal(back.indices, mat.indices)
    assert np.array_equal(back.data, mat.data)


def test_save_load_device_roundtrip(tmp_path, mat):
    path = str(tmp_path / "m.npz")
    save_csr(path, smm.from_scipy(mat))
    dev = load_csr(path, device=True)
    assert isinstance(dev, smm.CSRMatrix)
    np.testing.assert_allclose(
        smm.to_scipy(dev).toarray(), mat.toarray(), rtol=1e-12
    )


def test_save_load_dense_input(tmp_path):
    d = np.arange(12.0).reshape(3, 4)
    path = str(tmp_path / "d.npz")
    save_csr(path, d)
    np.testing.assert_allclose(load_csr(path).toarray(), d)


def test_partitioned_roundtrip(tmp_path, mat):
    prefix = str(tmp_path / "part")
    paths = save_partitioned(prefix, mat, n_shards=4)
    assert len(paths) == 4
    shards, meta = load_partitioned(prefix)
    assert meta["shape"] == list(mat.shape)
    assert sum(s.shape[0] for s in shards) == mat.shape[0]
    whole = load_sharded_result(prefix)
    np.testing.assert_allclose(whole.toarray(), mat.toarray())


def test_partitioned_flop_balanced(tmp_path, mat):
    # Skewed matrix: one heavy block of rows.
    a = sp.random(64, 64, density=0.02, format="csr", random_state=1).tolil()
    a[:8] = np.ones(64)
    a = a.tocsr()
    b = sp.random(64, 64, density=0.3, format="csr", random_state=2)
    prefix = str(tmp_path / "fb")
    save_partitioned(prefix, a, n_shards=4, b_indptr=b.indptr)
    shards, meta = load_partitioned(prefix)
    bounds = meta["bounds"]
    # The heavy rows should land in a smaller first shard than equal split.
    assert bounds[1] < 64 // 4 + 1
    np.testing.assert_allclose(
        load_sharded_result(prefix).toarray(), a.toarray()
    )


def test_partitioned_subset_load(tmp_path, mat):
    prefix = str(tmp_path / "sub")
    save_partitioned(prefix, mat, n_shards=3)
    shards, meta = load_partitioned(prefix, shard_ids=[1], device=True)
    assert len(shards) == 1
    lo, hi = meta["bounds"][1], meta["bounds"][2]
    np.testing.assert_allclose(
        smm.to_scipy(shards[0]).toarray(), mat[lo:hi].toarray(), rtol=1e-12
    )


def test_multiply_from_checkpoint(tmp_path):
    """End-to-end: persist operands, reload, multiply, match scipy."""
    a = sp.random(40, 30, density=0.2, format="csr", random_state=3)
    b = sp.random(30, 25, density=0.2, format="csr", random_state=4)
    pa, pb = str(tmp_path / "a.npz"), str(tmp_path / "b.npz")
    save_csr(pa, a)
    save_csr(pb, b)
    c = smm.sparse_matrix_multiply(load_csr(pa), load_csr(pb))
    np.testing.assert_allclose(
        c.toarray(), (a @ b).toarray(), rtol=1e-5, atol=1e-8
    )


def test_load_sharded_operand_feeds_distributed(tmp_path):
    """Checkpoint -> row-sharded device operand -> distributed product."""
    import jax

    from sparse_matrix_mult_tpu.io import load_sharded_operand
    from sparse_matrix_mult_tpu.parallel.distributed import (
        spgemm_dense_distributed,
    )
    from sparse_matrix_mult_tpu.parallel.mesh import row_mesh

    if len(jax.devices()) < 2:
        return
    mesh = row_mesh()
    S = mesh.devices.size
    a = sp.random(48, 40, density=0.2, format="csr", random_state=7)
    b = sp.random(40, 32, density=0.2, format="csr", random_state=8)
    prefix = str(tmp_path / "op")
    save_partitioned(prefix, a, n_shards=S)
    a_sh = load_sharded_operand(prefix, mesh)
    assert a_sh.n_shards == S
    assert len(a_sh.indices.addressable_shards) == S
    np.testing.assert_allclose(a_sh.to_scipy().toarray(), a.toarray())
    got = spgemm_dense_distributed(a_sh, b, mesh=mesh)
    np.testing.assert_allclose(
        np.asarray(got), (a @ b).toarray(), rtol=1e-10, atol=1e-12
    )

    # Mismatched shard count falls back to stitch + uniform re-shard.
    prefix2 = str(tmp_path / "op2")
    save_partitioned(prefix2, a, n_shards=3)
    a_sh2 = load_sharded_operand(prefix2, mesh)
    np.testing.assert_allclose(a_sh2.to_scipy().toarray(), a.toarray())
