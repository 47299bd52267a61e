"""Shared helpers for benchmarks and tests."""

from __future__ import annotations

import numpy as np

__all__ = ["hypersparse_random"]


def hypersparse_random(m: int, n: int, nnz: int, seed: int):
    """Uniform random CSR with ~``nnz`` entries in O(nnz).

    ``scipy.sparse.random`` with a legacy integer seed samples without
    replacement by materializing a full permutation of the m*n cells --
    80 GB of int64 and hours of shuffling at 100k x 100k (observed).
    Sampling WITH replacement and letting the COO->CSR conversion sum the
    handful of duplicates is equivalent for benchmarking and testing.
    """
    import scipy.sparse as sp

    rng = np.random.default_rng(seed)
    return sp.coo_matrix(
        (
            rng.uniform(size=nnz),
            (rng.integers(0, m, nnz), rng.integers(0, n, nnz)),
        ),
        shape=(m, n),
    ).tocsr()
