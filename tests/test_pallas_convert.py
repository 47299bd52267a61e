"""Differential tests for the Pallas CSR<->dense conversion kernels.

On CPU the kernels execute in the Pallas interpreter, exercising the exact
program the TPU compiles (the XLA shift networks remain the production CPU
path; ``force_pallas_convert`` routes through the kernels here).
"""

import numpy as np
import pytest
import scipy.sparse as sp

import jax.numpy as jnp

from sparse_matrix_mult_tpu import from_scipy, set_config
from sparse_matrix_mult_tpu.ops.pallas.convert_kernels import (
    csr_to_dense_pallas,
    dense_to_csr_pallas,
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


@pytest.mark.parametrize("m,n,d,lane,gs", CASES)
def test_dense_to_csr_pallas_matches_scipy(m, n, d, lane, gs):
    a = sp.random(m, n, density=d, format="csr", random_state=1)
    dense = np.asarray(a.todense(), np.float32)
    cap = max(128, 1 << (max(a.nnz, 1) - 1).bit_length())

    ip, ci, v = dense_to_csr_pallas(jnp.asarray(dense), cap, lane=lane, scan_group=gs)
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


@pytest.mark.parametrize("m,n,d,lane,gs", CASES)
def test_csr_to_dense_pallas_roundtrip(m, n, d, lane, gs):
    a = sp.random(m, n, density=d, format="csr", random_state=2)
    dense = np.asarray(a.todense(), np.float32)
    dev = from_scipy(a, dtype=jnp.float32)

    back = csr_to_dense_pallas(
        dev.indptr, dev.indices, dev.values, (m, n), lane=lane, scan_group=gs
    )
    assert np.allclose(np.asarray(back), dense)


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
