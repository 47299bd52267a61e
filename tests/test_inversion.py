"""Differential tests for the linear-inversion workflow (models/inversion.py)
against a dense numpy implementation of the textbook update equations.

The reference ships only the triple-product kernel for this workload
(``/root/reference/README.md:5``); the model layer assembles the full batch
inversion, so its oracle is the straightforward dense formulation.
"""

import numpy as np
import scipy.sparse as sp

import sparse_matrix_mult_tpu as smm
from sparse_matrix_mult_tpu.models.inversion import invert, posterior_covariance


def _problem(n_obs=12, n_state=40, seed=0):
    rng = np.random.default_rng(seed)
    H = sp.random(n_obs, n_state, density=0.3, format="csr", random_state=seed)
    # SPD prior covariance: A A^T + diag
    A = sp.random(n_state, n_state, density=0.1, format="csr", random_state=seed + 1)
    Q = (A @ A.T + sp.eye(n_state) * 2.0).tocsr()
    y = rng.standard_normal(n_obs)
    x0 = rng.standard_normal(n_state)
    r = rng.random(n_obs) + 0.5
    return H, Q, y, x0, r


def _oracle(H, Q, y, x0, r):
    Hd, Qd = H.toarray(), Q.toarray()
    S = Hd @ Qd @ Hd.T + np.diag(r)
    QHt = Qd @ Hd.T
    innov = y - Hd @ x0
    K = QHt @ np.linalg.inv(S)
    x_post = x0 + K @ innov
    P = Qd - K @ QHt.T
    return x_post, np.diag(P), S, P


def test_invert_matches_dense_oracle():
    H, Q, y, x0, r = _problem()
    res = invert(smm.from_scipy(H), smm.from_scipy(Q), y, x0, r)
    x_ref, p_ref, s_ref, _ = _oracle(H, Q, y, x0, r)
    np.testing.assert_allclose(np.asarray(res.x_post), x_ref, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(res.p_diag), p_ref, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(res.s), s_ref, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(res.innovation), y - H @ x0, rtol=1e-5, atol=1e-8
    )


def test_posterior_covariance_matches_oracle():
    H, Q, y, x0, r = _problem(seed=3)
    got = np.asarray(posterior_covariance(smm.from_scipy(H), smm.from_scipy(Q), r))
    _, _, _, p_ref = _oracle(H, Q, y, x0, r)
    np.testing.assert_allclose(got, p_ref, rtol=1e-5, atol=1e-6)
    # Posterior variances shrink relative to the prior.
    assert np.all(np.diag(got) <= np.diag(Q.toarray()) + 1e-9)
