"""Shared kernel utilities: precision/interpret resolution, masks, matmul."""

from __future__ import annotations


import jax
import jax.numpy as jnp

_PRECISIONS = {
    "highest": jax.lax.Precision.HIGHEST,
    "high": jax.lax.Precision.HIGH,
    "default": jax.lax.Precision.DEFAULT,
}


def resolve_precision(name: str) -> jax.lax.Precision:
    return _PRECISIONS[name]


def resolve_interpret(interpret) -> bool:
    """None → auto: interpret Pallas kernels on non-TPU backends so the whole
    suite runs on CPU (SURVEY.md §4 'fake backend' row; §5 race-detection row:
    interpret mode is the Mosaic sanitizer path)."""
    if interpret is None:
        return jax.default_backend() != "tpu"
    return bool(interpret)


def acc_type(dt):
    """Accumulation dtype for matmuls (pallas_guide: always set
    preferred_element_type): fp32 for fp32/bf16 operands; float64 operands
    (CPU/interpret-mode paths — TPUs have no native f64) must accumulate in
    f64 or the whole factorization silently rounds to fp32 accuracy."""
    return dt if dt == jnp.float64 else jnp.float32


def dot(a, b, precision):
    """MXU matmul with dtype-matched accumulation."""
    return jnp.dot(
        a, b, precision=precision, preferred_element_type=acc_type(a.dtype)
    ).astype(a.dtype)


def dot_t(a, b, precision):
    """aᵀ @ b without materializing the transpose (MXU-native contraction)."""
    out = jax.lax.dot_general(
        a,
        b,
        dimension_numbers=(((0,), (0,)), ((), ())),
        precision=precision,
        preferred_element_type=acc_type(a.dtype),
    )
    return out.astype(a.dtype)


def tril_mask(m: int, n: int, k: int = 0):
    """Boolean lower-triangle mask via broadcasted_iota (TPU needs ≥2D iota)."""
    rows = jax.lax.broadcasted_iota(jnp.int32, (m, n), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (m, n), 1)
    return rows >= cols - k


def unit_lower(packed: jnp.ndarray) -> jnp.ndarray:
    """V = strictly-lower(packed) + I — the implicit-unit-diagonal convention
    of LAPACK GEQRT packed output (ref/tile_ops.py)."""
    m, n = packed.shape
    rows = jax.lax.broadcasted_iota(jnp.int32, (m, n), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (m, n), 1)
    v = jnp.where(rows > cols, packed, jnp.zeros_like(packed))
    return v + jnp.where(rows == cols, jnp.ones_like(packed), jnp.zeros_like(packed))


def triu(a: jnp.ndarray) -> jnp.ndarray:
    m, n = a.shape
    rows = jax.lax.broadcasted_iota(jnp.int32, (m, n), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (m, n), 1)
    return jnp.where(rows <= cols, a, jnp.zeros_like(a))
