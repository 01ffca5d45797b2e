"""TSQRT — triangle-on-square couple factorization (reference component C3).

QR of the 2-tile stack [R; B] (R n×n upper-triangular, B m×n dense): updates
R, produces the dense V2 (in B's slot) and the compact-WY T2
[SURVEY.md §2.1 C3; PLASMA xTSQRT]. TPU-native realization: TSQRT *is* GEQRT
on the stacked couple — R's zero lower triangle means the masked Householder
ops of ``geqrt_in_refs`` (kernels/geqrt.py) never touch it, so the generic
body yields the structured result (v = [e_j; v2_j]) with no special-casing.
The couple is held transposed in one (n, n+m) VMEM scratch: lanes 0..n-1 are
R's rows, lanes n..n+m-1 are B's rows.

The drivers use the fused panel kernel (kernels/panel.py), which carries R in
a persistent output buffer across the whole sub-diagonal chain; this
standalone entry exists for unit tests and the batched path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tileqr.kernels.common import resolve_interpret
from tileqr.kernels.geqrt import geqrt_in_refs


def _tsqrt_kernel(r_ref, b_ref, r_out_ref, v2_ref, t2_ref, at_scr, tt_scr):
    n = r_ref.shape[0]
    at_scr[:, :n] = r_ref[:].T
    at_scr[:, n:] = b_ref[:].T
    tt_scr[:] = jnp.zeros_like(tt_scr)
    geqrt_in_refs(at_scr, tt_scr, n)
    r_out_ref[:] = at_scr[:, :n].T  # strictly-lower entries stay exactly 0
    v2_ref[:] = at_scr[:, n:].T
    t2_ref[:] = tt_scr[:].T


@functools.partial(jax.jit, static_argnames=("interpret",))
def _tsqrt_call(r, b, interpret: bool):
    n = r.shape[0]
    m = b.shape[0]
    dt = r.dtype
    return pl.pallas_call(
        _tsqrt_kernel,
        out_shape=(
            jax.ShapeDtypeStruct((n, n), dt),
            jax.ShapeDtypeStruct((m, n), dt),
            jax.ShapeDtypeStruct((n, n), dt),
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((n, n + m), dt),
            pltpu.VMEM((n, n), dt),
        ],
        interpret=interpret,
    )(r, b)


def tsqrt(r: jnp.ndarray, b: jnp.ndarray, interpret: bool | None = None):
    """Standalone TSQRT: (R n×n upper-tri, B m×n) → (R', V2, T2)."""
    return _tsqrt_call(r, b, resolve_interpret(interpret))
