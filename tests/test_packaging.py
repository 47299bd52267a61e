"""Native-library packaging: resolution order and load health.

The round-1 loader resolved the library relative to the repo root, which
broke for installed packages (pip install silently fell back to numpy).
The loader now searches package data first (`sparse_matrix_mult_tpu/lib/`,
where setup.py's build_py hook compiles it), then the dev checkout's
native/ build output.
"""

import os

import numpy as np

from sparse_matrix_mult_tpu.utils import native


def test_candidates_prefer_package_data():
    cands = list(native._lib_candidates())
    pkg_dir = os.path.dirname(os.path.dirname(os.path.abspath(native.__file__)))
    assert cands[0].startswith(os.path.join(pkg_dir, "lib"))
    assert cands[-1].endswith(os.path.join("native", "libsmmhost.so"))


def test_native_lib_loads_here():
    lib = native.get_native()
    assert lib is not None, "native host library should build/load in CI"
    assert lib.smm_num_threads() >= 1


def test_native_matches_numpy_fallbacks():
    rng = np.random.default_rng(0)
    import scipy.sparse as sp

    A = sp.random(40, 30, density=0.2, format="csr", random_state=1)
    B = sp.random(30, 20, density=0.3, format="csr", random_state=2)
    exp = native.expansion_size(A.indices, A.nnz, B.indptr)
    per = (B.indptr[A.indices + 1] - B.indptr[A.indices]).sum()
    assert exp == per
    rf = native.row_flops(A.indptr, A.indices, B.indptr)
    assert rf.sum() == exp
