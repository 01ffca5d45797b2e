"""Batched QR path (BASELINE.json:10 config — 4096 independent 128² fp32
matrices). Single-tile matrices (m, n <= nb) factored by ONE pallas_call with
the batch as the grid dimension — the TPU equivalent of a batched kernel
launch; Q is formed from the compact-WY identity Q = I − V T Vᵀ with batched
MXU matmuls (no reflector replay needed for one tile)."""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tileqr.kernels.common import (
    resolve_interpret,
    resolve_precision,
    triu,
    unit_lower,
)
from tileqr.kernels.geqrt import geqrt_in_refs


def _batched_geqrt_kernel(a_ref, packed_ref, t_ref, at_scr, tt_scr):
    _, m, n = a_ref.shape
    at_scr[:] = a_ref[0].T
    tt_scr[:] = jnp.zeros_like(tt_scr)
    geqrt_in_refs(at_scr, tt_scr, min(m, n))
    packed_ref[0] = at_scr[:].T
    t_ref[0] = tt_scr[:].T


@functools.partial(jax.jit, static_argnames=("interpret",))
def geqrt_batched(a, interpret: bool = False):
    """a: (B, m, n) → (packed (B, m, n), T (B, n, n)); one grid step per
    matrix, tile resident in VMEM."""
    b, m, n = a.shape
    dt = a.dtype
    return pl.pallas_call(
        _batched_geqrt_kernel,
        grid=(b,),
        in_specs=[pl.BlockSpec((1, m, n), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)],
        out_shape=(
            jax.ShapeDtypeStruct((b, m, n), dt),
            jax.ShapeDtypeStruct((b, n, n), dt),
        ),
        out_specs=(
            pl.BlockSpec((1, m, n), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, n), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((n, m), dt),
            pltpu.VMEM((n, n), dt),
        ],
        interpret=interpret,
    )(a)


@functools.partial(jax.jit, static_argnames=("mode", "precision", "interpret"))
def qr_batched(
    a: jnp.ndarray,
    mode: str = "reduced",
    precision: str = "highest",
    interpret: bool | None = None,
):
    """Batched QR of (B, m, n) single-tile matrices (m <= 512 recommended).

    mode: "reduced" → (Q (B, m, n), R (B, n, n)); "r" → R only.
    """
    interp = resolve_interpret(interpret)
    prec = resolve_precision(precision)
    b, m, n = a.shape
    if n > m:
        raise ValueError("qr_batched requires m >= n")
    packed, t = geqrt_batched(a, interpret=interp)
    r = jax.vmap(lambda p: triu(p[:n, :]))(packed)
    if mode == "r":
        return r

    def form_q(p, tm):
        v = unit_lower(p)  # (m, n)
        # reduced Q = (I − V T Vᵀ)[:, :n] = E_n − V T (Vᵀ E_n) = E_n − V T V₁ᵀ
        w = jnp.dot(tm, v[:n, :].T, precision=prec, preferred_element_type=jnp.float32)
        q = -jnp.dot(v, w.astype(a.dtype), precision=prec, preferred_element_type=jnp.float32)
        q = q.astype(a.dtype)
        eye = (
            jax.lax.broadcasted_iota(jnp.int32, (m, n), 0)
            == jax.lax.broadcasted_iota(jnp.int32, (m, n), 1)
        ).astype(a.dtype)
        return q + eye

    q = jax.vmap(form_q)(packed, t)
    return q, r
