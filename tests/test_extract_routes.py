"""Both sparse-output extraction strategies (host pack vs device extract)
produce identical results; the size cutoff picks between them."""

import numpy as np
import pytest
import scipy.sparse as sp

import sparse_matrix_mult_tpu as smm
from sparse_matrix_mult_tpu.config import get_config, set_config


@pytest.fixture
def restore_limits():
    cfg = get_config()
    saved = cfg.host_extract_limit
    yield
    set_config(host_extract_limit=saved)


@pytest.mark.parametrize("symmetric", [False, True])
def test_host_and_device_extract_agree(restore_limits, symmetric):
    A = sp.random(120, 120, density=0.15, format="csr", random_state=1)
    B = sp.random(120, 120, density=0.15, format="csr", random_state=2)

    set_config(host_extract_limit=1 << 30)  # force host pack
    host = smm.sparse_matrix_multiply(A, B, symmetric=symmetric)
    set_config(host_extract_limit=0)  # force device extraction
    dev = smm.sparse_matrix_multiply(A, B, symmetric=symmetric)

    assert host.nnz == dev.nnz
    np.testing.assert_allclose(
        host.toarray(), dev.toarray(), rtol=1e-12, atol=1e-14
    )
    ref = (A @ B).toarray()
    if symmetric:
        ref = np.triu(ref)
    np.testing.assert_allclose(host.toarray(), ref, rtol=1e-5, atol=1e-8)
