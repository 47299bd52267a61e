"""Tests for the upper-tile-only Pallas matmul and its dispatch wiring."""

import numpy as np
import pytest
import scipy.sparse as sp

import jax.numpy as jnp

from sparse_matrix_mult_tpu import from_scipy, set_config
from sparse_matrix_mult_tpu.ops.pallas.triu_matmul import matmul_triu


@pytest.mark.parametrize("split3", [True, False])
@pytest.mark.parametrize("transpose_b", [False, True])
@pytest.mark.parametrize("m,k", [(300, 500), (256, 256), (100, 700)])
def test_matmul_triu_matches_numpy(m, k, transpose_b, split3):
    rng = np.random.default_rng(m + k)
    a = rng.standard_normal((m, k)).astype(np.float32)
    b = (
        rng.standard_normal((m, k)).astype(np.float32)
        if transpose_b
        else rng.standard_normal((k, m)).astype(np.float32)
    )
    got = np.triu(
        np.asarray(
            matmul_triu(jnp.asarray(a), jnp.asarray(b), transpose_b=transpose_b,
                        tile=128, kblock=128, split3=split3)
        )
    )
    ref = np.triu(a @ (b.T if transpose_b else b))
    assert got.shape == ref.shape
    if split3:
        # Double-bf16 split error bound: the dropped lo*lo term is
        # <= 2^-16 per product, so |err| <= 2^-16 * sum_j |a_ij b_jk|.
        bound = 2.0**-16 * (np.abs(a) @ np.abs(b.T if transpose_b else b))
        assert np.all(np.abs(got - ref) <= np.triu(bound) + 1e-6)
    else:
        assert np.allclose(got, ref, rtol=1e-4, atol=1e-4)


def test_symmetric_spgemm_via_triu_kernel():
    """spgemm_dense_out(symmetric=True) through the forced kernel path."""
    from sparse_matrix_mult_tpu.ops.dense_path import spgemm_dense_out

    a_sp = sp.random(260, 300, density=0.1, format="csr", random_state=1)
    b_sp = sp.random(300, 260, density=0.1, format="csr", random_state=2)
    ref = np.triu((a_sp @ b_sp).toarray())

    set_config(force_pallas_triu=True)
    try:
        a = from_scipy(a_sp, dtype=jnp.float32)
        b = from_scipy(b_sp, dtype=jnp.float32)
        got = np.asarray(spgemm_dense_out(a, b, symmetric=True, precision="fast"))
    finally:
        set_config(force_pallas_triu=False)
    assert np.allclose(got, ref, rtol=1e-4, atol=1e-5)


def test_triple_product_via_triu_kernel():
    from sparse_matrix_mult_tpu.ops.triple_product import triple_product_dense

    h_sp = sp.random(200, 300, density=0.1, format="csr", random_state=3)
    q_sp = sp.random(300, 300, density=0.1, format="csr", random_state=4)
    full = (h_sp @ q_sp @ h_sp.T).toarray()

    set_config(force_pallas_triu=True)
    try:
        h = from_scipy(h_sp, dtype=jnp.float32)
        q = from_scipy(q_sp, dtype=jnp.float32)
        upper = np.asarray(triple_product_dense(h, q, 0, precision="fast"))
        mirrored = np.asarray(triple_product_dense(h, q, 1, precision="fast"))
    finally:
        set_config(force_pallas_triu=False)
    assert np.allclose(upper, np.triu(full), rtol=1e-4, atol=1e-5)
    sym = np.triu(full) + np.triu(full, 1).T
    assert np.allclose(mirrored, sym, rtol=1e-4, atol=1e-5)


def test_split3_gate_term_model():
    """Round-5 size/term gate (VERDICT r4 item 5): split3 engages only when
    the 2^-16/sqrt(T_min) error model clears the rtol=1e-5 oracle with 2x
    margin.  Dense-accumulation shapes pass, sparse-accumulation shapes
    (single-term entries possible) fall back to 6-pass f32."""
    import jax.numpy as jnp

    from sparse_matrix_mult_tpu.config import get_config
    from sparse_matrix_mult_tpu.ops.dense_path import _split3_within_oracle
    from sparse_matrix_mult_tpu.types import CSRMatrix

    def fake(m, k, n, tbar):
        # Gate reads only shapes + capacities: tbar = cap_a*cap_b/(m*k*n).
        cap = int((tbar * m * k * n) ** 0.5)
        z = jnp.zeros(cap, jnp.float32)
        zi = jnp.zeros(cap, jnp.int32)
        a = CSRMatrix(jnp.zeros(m + 1, jnp.int32), zi, z, (m, k))
        b = CSRMatrix(jnp.zeros(k + 1, jnp.int32), zi, z, (k, n))
        return a, b

    # ~100 expected terms/entry at 1000^2 output: comfortably in-oracle.
    assert _split3_within_oracle(*fake(1000, 1000, 1000, 100.0))
    # ~5 expected terms/entry: single-term entries exist -> rel ~2^-16.
    assert not _split3_within_oracle(*fake(1000, 1000, 1000, 5.0))
    # Escape hatch restores round-4 behavior.
    old = get_config().triu_split3_gate
    set_config(triu_split3_gate=False)
    try:
        assert _split3_within_oracle(*fake(1000, 1000, 1000, 5.0))
    finally:
        set_config(triu_split3_gate=old)
