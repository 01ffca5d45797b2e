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


@functools.partial(jax.jit, static_argnames=("ib", "precision"))
def geqrt_batched_vec(a, ib: int = 32, precision: str = "highest"):
    """Batch-vectorized GEQRT (pure XLA, no Pallas): the Householder column
    recurrence runs once with every per-column op batched over B — the
    per-column serial latency (which makes the per-matrix grid path
    latency-bound) is amortized across the whole batch, and the ib-block
    reflector applies become batched MXU matmuls.

    a: (B, m, n) → (packed (B, m, n), T (B, n, n)). Same contract as
    geqrt_batched.
    """
    from tileqr.kernels.common import resolve_precision

    prec = resolve_precision(precision)
    b, m, n = a.shape
    dt = a.dtype
    kcols = min(m, n)
    row_ids = jnp.arange(m)[None, :]
    one = jnp.ones((), dt)
    zero = jnp.zeros((), dt)

    def ee(spec, x, y):
        return jnp.einsum(spec, x, y, precision=prec, preferred_element_type=jnp.float32).astype(dt)

    tmat = jnp.zeros((b, n, n), dt)
    vmat = jnp.zeros((b, m, n), dt)

    for s in range(0, kcols, ib):
        e = min(s + ib, kcols)
        ibk = e - s
        for jj in range(ibk):
            j = s + jj
            col = a[:, :, j]  # (B, m)
            alpha = col[:, j]  # (B,)
            tail = jnp.where(row_ids > j, col, zero)
            tailsq = jnp.sum(tail * tail, axis=1)
            sgn = jnp.where(alpha >= 0, one, -one)
            nrm = jnp.sqrt(alpha * alpha + tailsq)
            has = tailsq > 0
            beta = jnp.where(has, -sgn * nrm, alpha)
            tau = jnp.where(has, (beta - alpha) / beta, zero)
            scale = jnp.where(has, 1 / (alpha - beta), zero)
            v = jnp.where(
                row_ids == j, one, jnp.where(row_ids > j, col * scale[:, None], zero)
            )  # (B, m)
            if j + 1 < e:
                blk = a[:, :, j + 1 : e]
                wv = ee("bm,bmw->bw", v, blk)
                a = a.at[:, :, j + 1 : e].add(
                    -(tau[:, None] * v)[:, :, None] * wv[:, None, :]
                )
            newcol = jnp.where(
                row_ids == j,
                beta[:, None],
                jnp.where(row_ids > j, col * scale[:, None], col),
            )
            a = a.at[:, :, j].set(newcol)
            # block-local T column
            vblk = vmat[:, :, s:e]  # rows >= jj still zero
            z = ee("bm,bmi->bi", v, vblk)
            y = ee("bij,bj->bi", tmat[:, s:e, s:e], z)
            iic = jnp.arange(ibk)[None, :]
            tcol = jnp.where(
                iic == jj, tau[:, None], jnp.where(iic < jj, -tau[:, None] * y, zero)
            )
            tmat = tmat.at[:, s:e, j].set(tcol)
            vmat = vmat.at[:, :, j].set(v)
        vb = vmat[:, :, s:e]
        tb = tmat[:, s:e, s:e]
        if e < n:
            rest = a[:, :, e:]
            g = ee("bmi,bmr->bir", vb, rest)
            g2 = ee("bji,bjr->bir", tb, g)
            a = a.at[:, :, e:].add(-ee("bmi,bir->bmr", vb, g2))
        if s > 0:
            z1 = ee("bmp,bmi->bpi", vmat[:, :, :s], vb)
            m2 = ee("bqp,bpi->bqi", tmat[:, :s, :s], z1)
            tmat = tmat.at[:, :s, s:e].set(-ee("bqi,bij->bqj", m2, tb))
    return a, tmat


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
    prec = resolve_precision(precision)
    b, m, n = a.shape
    if n > m:
        raise ValueError("qr_batched requires m >= n")
    # batch-vectorized path: amortizes the serial column latency over B
    packed, t = geqrt_batched_vec(a, precision=precision)
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
