"""Compute kernels: dense fast path, expansion-sort SpGEMM, triple product,
precision-policy matmuls, and Pallas TPU kernels."""

from .dense_path import spgemm_dense_out, spgemm_sparse_out
from .pallas.bsr_spgemm import bsr_matmul_dense
from .matmul import policy_matmul
from .spgemm_jnp import expansion_size, spgemm_esc
from .triple_product import triple_product_dense

__all__ = [
    "spgemm_dense_out",
    "spgemm_sparse_out",
    "spgemm_esc",
    "expansion_size",
    "triple_product_dense",
    "policy_matmul",
    "bsr_matmul_dense",
]
