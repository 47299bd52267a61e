"""Precision-policy dense matmuls for TPU.

The reference computes strictly in float64 on CPU
(``/root/reference/include/matrix_def.h:21-23``).  TPUs are f32/bf16-native;
these helpers provide f64-oracle-compatible matmuls at several speed/accuracy
points (see :class:`sparse_matrix_mult_tpu.config.Precision`).  All heavy
arithmetic stays on the MXU; recombination of split products is cheap VPU work
fused by XLA.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..config import Precision, get_config

__all__ = ["policy_matmul", "split_operand", "resolve_precision"]


def resolve_precision(precision: str | None, expected_terms: float) -> str:
    """Resolve AUTO to a concrete policy given expected dot-product length."""
    cfg = get_config()
    p = precision or cfg.precision
    if p == Precision.AUTO:
        return Precision.FAST if expected_terms <= cfg.auto_split_terms else Precision.SPLIT
    return p


def _on_tpu() -> bool:
    return jax.default_backend() == "tpu"


def split_operand(x: jax.Array):
    """Double-float split: ``x ~= hi + lo`` with both parts exactly f32."""
    hi = x.astype(jnp.float32)
    lo = (x - hi.astype(x.dtype)).astype(jnp.float32)
    return hi, lo


def policy_matmul(
    a: jax.Array,
    b: jax.Array,
    precision: str = Precision.FAST,
    out_dtype=None,
) -> jax.Array:
    """``a @ b`` under a precision policy.

    On non-TPU backends (CPU tests, the virtual multi-device mesh) this is a
    plain native-dtype matmul -- CPU float64 is exact parity with scipy.
    """
    if out_dtype is None:
        out_dtype = jnp.result_type(a.dtype, b.dtype)

    if not _on_tpu() or precision == Precision.STRICT:
        return jnp.dot(a, b, precision="highest").astype(out_dtype)

    if precision == Precision.FAST:
        r = jnp.dot(
            a.astype(jnp.float32),
            b.astype(jnp.float32),
            precision="highest",
            preferred_element_type=jnp.float32,
        )
        return r.astype(out_dtype)

    if precision == Precision.SPLIT:
        ahi, alo = split_operand(a)
        bhi, blo = split_operand(b)
        kw = dict(precision="highest", preferred_element_type=jnp.float32)
        hh = jnp.dot(ahi, bhi, **kw)
        hl = jnp.dot(ahi, blo, **kw)
        lh = jnp.dot(alo, bhi, **kw)
        acc = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
        return (hh.astype(acc) + (hl.astype(acc) + lh.astype(acc))).astype(out_dtype)

    raise ValueError(f"unknown precision policy: {precision!r}")
