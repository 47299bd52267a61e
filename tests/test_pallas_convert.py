"""Differential tests for the Pallas CSR<->dense conversion kernels.

On CPU the kernels execute in the Pallas interpreter, exercising the exact
program the TPU compiles (the XLA shift networks remain the production CPU
path; ``force_pallas_convert`` routes through the kernels here).

Covers all three entry points: the production dispatcher (staged path with
size-tuned tiling), the staged two-level variant directly (Pallas networks +
XLA scan stitch), and the experimental fused single-kernel conversions
(in-kernel block-aligned stitch via scalar-prefetched index maps).
"""

import functools

import numpy as np
import pytest
import scipy.sparse as sp

import jax.numpy as jnp

from sparse_matrix_mult_tpu import from_scipy, set_config
from sparse_matrix_mult_tpu.ops.pallas.convert_kernels import (
    csr_to_dense_fused,
    csr_to_dense_pallas,
    csr_to_dense_staged,
    dense_to_csr_fused,
    dense_to_csr_pallas,
    dense_to_csr_staged,
)


CASES = [
    # (rows, cols, density, lane, scan_group)
    (16, 300, 0.2, 256, 4),
    (37, 1000, 0.1, 512, 4),
    (8, 128, 0.0, 128, 2),  # all-zero
    (100, 513, 0.5, 256, 4),
    (5, 64, 1.0, 128, 2),  # fully dense
    (200, 200, 0.05, 256, 8),
    (63, 190, 0.3, 128, 3),  # lane not dividing total, odd scan group
]


def _extract_impls(lane, gs):
    return {
        "dispatch": functools.partial(dense_to_csr_pallas, lane=lane),
        "fused": functools.partial(dense_to_csr_fused, lane=lane),
        "staged": functools.partial(dense_to_csr_staged, lane=lane, scan_group=gs),
    }


def _densify_impls(lane, gs):
    return {
        "dispatch": functools.partial(csr_to_dense_pallas, lane=lane),
        "fused": functools.partial(csr_to_dense_fused, lane=lane),
        "staged": functools.partial(csr_to_dense_staged, lane=lane, scan_group=gs),
    }


@pytest.mark.parametrize("impl", ["dispatch", "fused", "staged"])
@pytest.mark.parametrize("m,n,d,lane,gs", CASES)
def test_dense_to_csr_pallas_matches_scipy(m, n, d, lane, gs, impl):
    a = sp.random(m, n, density=d, format="csr", random_state=1)
    dense = np.asarray(a.todense(), np.float32)
    cap = max(128, 1 << (max(a.nnz, 1) - 1).bit_length())

    fn = _extract_impls(lane, gs)[impl]
    ip, ci, v = fn(jnp.asarray(dense), cap)
    ip, ci, v = np.asarray(ip), np.asarray(ci), np.asarray(v)

    ref = sp.csr_matrix(dense)
    ref.eliminate_zeros()
    nnz = ip[-1]
    assert nnz == ref.nnz
    assert np.array_equal(ip, ref.indptr)
    assert np.array_equal(ci[:nnz], ref.indices)
    assert np.allclose(v[:nnz], ref.data)
    # Padding contract: zeros past nnz.
    assert np.all(v[nnz:] == 0)
    assert np.all(ci[nnz:] == 0)


@pytest.mark.parametrize("impl", ["dispatch", "fused", "staged"])
@pytest.mark.parametrize("m,n,d,lane,gs", CASES)
def test_csr_to_dense_pallas_roundtrip(m, n, d, lane, gs, impl):
    a = sp.random(m, n, density=d, format="csr", random_state=2)
    dense = np.asarray(a.todense(), np.float32)
    dev = from_scipy(a, dtype=jnp.float32)

    fn = _densify_impls(lane, gs)[impl]
    back = fn(dev.indptr, dev.indices, dev.values, (m, n))
    assert np.allclose(np.asarray(back), dense)


@pytest.mark.parametrize("impl", ["dispatch", "fused", "staged"])
def test_cross_impl_agreement(impl):
    """Fused and staged implementations produce identical packed output."""
    a = sp.random(41, 700, density=0.13, format="csr", random_state=9)
    dense = np.asarray(a.todense(), np.float32)
    cap = 1 << 12
    fn = _extract_impls(256, 4)[impl]
    ip, ci, v = fn(jnp.asarray(dense), cap)
    ref = sp.csr_matrix(dense)
    assert np.array_equal(np.asarray(ip), ref.indptr)
    assert np.allclose(np.asarray(v)[: ref.nnz], ref.data)


TRIU_CASES = [
    # (n, density, strip, lane)
    (40, 0.3, 16, 128),
    (130, 0.1, 32, 256),
    (64, 0.0, 16, 128),  # all-zero
    (96, 1.0, 32, 128),  # fully dense upper triangle
    (200, 0.07, 64, 512),  # n not a strip multiple
]


@pytest.mark.parametrize("n,d,strip,lane", TRIU_CASES)
def test_dense_to_csr_triu_staircase(n, d, strip, lane):
    """Staircase extraction of an upper-triangular matrix matches scipy."""
    from sparse_matrix_mult_tpu.ops.pallas.convert_kernels import (
        dense_to_csr_triu_staged,
    )

    a = sp.random(n, n, density=d, format="csr", random_state=4)
    dense = np.triu(np.asarray(a.todense(), np.float32))
    ref = sp.csr_matrix(dense)
    ref.eliminate_zeros()
    cap = max(128, 1 << (max(ref.nnz, 1) - 1).bit_length())

    ip, ci, v = dense_to_csr_triu_staged(
        jnp.asarray(dense), cap, strip=strip, lane=lane, scan_group=4
    )
    ip, ci, v = np.asarray(ip), np.asarray(ci), np.asarray(v)
    nnz = ip[-1]
    assert nnz == ref.nnz
    assert np.array_equal(ip, ref.indptr)
    assert np.array_equal(ci[:nnz], ref.indices)
    assert np.allclose(v[:nnz], ref.data)
    assert np.all(v[nnz:] == 0)
    assert np.all(ci[nnz:] == 0)


def test_dense_to_csr_triu_dispatcher():
    """ops.convert.dense_to_csr_triu agrees with the plain extractor."""
    from sparse_matrix_mult_tpu.ops.convert import dense_to_csr, dense_to_csr_triu

    n = 150
    a = sp.random(n, n, density=0.1, format="csr", random_state=5)
    dense = jnp.asarray(np.triu(np.asarray(a.todense(), np.float32)))
    set_config(force_pallas_convert=True)
    try:
        tri = dense_to_csr_triu(dense, 1 << 12)
    finally:
        set_config(force_pallas_convert=False)
    plain = dense_to_csr(dense, 1 << 12)
    assert int(tri.indptr[-1]) == int(plain.indptr[-1])
    np.testing.assert_array_equal(np.asarray(tri.indptr), np.asarray(plain.indptr))
    nnz = int(tri.indptr[-1])
    np.testing.assert_array_equal(
        np.asarray(tri.indices)[:nnz], np.asarray(plain.indices)[:nnz]
    )
    np.testing.assert_allclose(
        np.asarray(tri.values)[:nnz], np.asarray(plain.values)[:nnz]
    )


def test_convert_dispatch_uses_pallas_when_forced():
    """convert.dense_to_csr / csr_to_dense route through the kernels."""
    from sparse_matrix_mult_tpu.ops.convert import csr_to_dense, dense_to_csr

    m, n = 700, 800  # above the _SMALL cutoff
    a = sp.random(m, n, density=0.05, format="csr", random_state=3)
    dense = np.asarray(a.todense(), np.float32)

    set_config(force_pallas_convert=True)
    try:
        csr = dense_to_csr(jnp.asarray(dense), 1 << 16)
        got = np.asarray(csr_to_dense(csr, jnp.float32))
    finally:
        set_config(force_pallas_convert=False)

    assert np.allclose(got, dense)
    ref = sp.csr_matrix(dense)
    assert int(csr.indptr[-1]) == ref.nnz
