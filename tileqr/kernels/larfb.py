"""LARFB — block-reflector application (reference component C2).

Applies the GEQRT reflector block of a factored tile to tiles right of the
diagonal: C ← (I − V T Vᵀ)^{T?} C — two-three back-to-back matmuls, pure MXU
work [SURVEY.md §2.1 C2; LAPACK xLARFB 'Left']. ``larfb_body`` is the value-
level body shared by the fused trailing-update kernel (kernels/update.py);
the standalone entry is for unit tests.
"""

from __future__ import annotations

import functools

import jax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tileqr.kernels.common import (
    dot,
    dot_t,
    resolve_interpret,
    resolve_precision,
    unit_lower,
)


def larfb_body(packed, t, c, trans: bool, precision):
    """C ← (I − V T Vᵀ)^{T if trans} C with V = unit_lower(packed)."""
    v = unit_lower(packed)
    w = dot_t(v, c, precision)  # Vᵀ C
    w = dot_t(t, w, precision) if trans else dot(t, w, precision)
    return c - dot(v, w, precision)


def _mk_kernel(trans: bool, precision):
    def kernel(packed_ref, t_ref, c_ref, out_ref):
        out_ref[:] = larfb_body(packed_ref[:], t_ref[:], c_ref[:], trans, precision)

    return kernel


@functools.partial(jax.jit, static_argnames=("trans", "precision", "interpret"))
def _larfb_call(packed, t, c, trans: bool, precision: str, interpret: bool):
    return pl.pallas_call(
        _mk_kernel(trans, resolve_precision(precision)),
        out_shape=jax.ShapeDtypeStruct(c.shape, c.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )(packed, t, c)


def larfb(packed, t, c, trans: bool = True, precision: str = "highest", interpret=None):
    """Standalone LARFB on one tile: packed (m, n), T (n, n), C (m, p)."""
    return _larfb_call(packed, t, c, trans, precision, resolve_interpret(interpret))
