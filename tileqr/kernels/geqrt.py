"""GEQRT — panel/tile QR factorization kernel (reference component C1).

The reference's GEQRT is a CUDA kernel factorizing one diagonal nb×nb tile in
shared memory with sequential Householder columns and compact-WY V/T
accumulation [SURVEY.md §2.1 C1, BASELINE.json:5]. The TPU-native equivalent
keeps the whole tile resident in VMEM and runs the column loop as a
``lax.fori_loop`` over a *transposed* scratch copy of the tile: with matrix
columns along sublanes and matrix rows along lanes, every per-column
operation — column extraction, masked norm, rank-1 trailing update, packed
write-back, incremental T row — is a sublane-dynamic ref slice
(``ref[pl.ds(j, 1), :]``) or a lane reduction, both cheap on the VPU.
(Lane-dimension dynamic indexing, which a row-major layout would need, is
expensive on TPU, and Mosaic does not lower ``dynamic_slice`` on register
values at all — hence scratch refs.)

``geqrt_in_refs`` is the core primitive of the whole library: TSQRT and
TTQRT (components C3/C5) are GEQRT on a stacked couple whose masked-out zero
structure the body handles for free, and the batched path grids over it.

Math contract (ref/tile_ops.py:geqrt, LAPACK xLARFG/xLARFT semantics):
  beta = -sign(alpha) * ||x||;  v = x/(alpha-beta), v0 = 1;
  tau = (beta-alpha)/beta;  T[j,j] = tau;  T[:j,j] = -tau T[:j,:j] (Vᵀ v_j).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tileqr.kernels.common import resolve_interpret


def geqrt_in_refs(at_ref, vt_ref, tt_ref, kcols: int) -> None:
    """Factor the tile held transposed in ``at_ref`` in place.

    at_ref: (n, m) VMEM scratch holding Aᵀ (sublane j = column j of A);
      on exit holds packedᵀ (R above the diagonal of A, v's below).
    vt_ref: (n, m) VMEM scratch, must be zeroed by the caller; on exit row j
      holds reflector v_j (unit at lane j).
    tt_ref: (n, n) VMEM scratch, must be zeroed; on exit holds Tᵀ.
    kcols: number of columns to eliminate (static).
    """
    n, m = at_ref.shape
    dt = at_ref.dtype
    one = jnp.ones((), dt)
    zero = jnp.zeros((), dt)
    lane_r = jax.lax.broadcasted_iota(jnp.int32, (1, m), 1)  # row ids of A
    sub_c = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)  # col ids of A
    lane_c = jax.lax.broadcasted_iota(jnp.int32, (1, n), 1)  # col ids (lanes)

    def step(j, _):
        xrow = at_ref[pl.ds(j, 1), :]  # (1, m): column j of A
        alpha = jnp.sum(jnp.where(lane_r == j, xrow, zero))
        tailsq = jnp.sum(jnp.where(lane_r > j, xrow * xrow, zero))
        sgn = jnp.where(alpha >= 0, one, -one)
        nrm = jnp.sqrt(alpha * alpha + tailsq)
        has_tail = tailsq > 0
        beta = jnp.where(has_tail, -sgn * nrm, alpha)
        tau = jnp.where(has_tail, (beta - alpha) / beta, zero)
        scale = jnp.where(has_tail, 1 / (alpha - beta), zero)
        v = jnp.where(lane_r == j, one, jnp.where(lane_r > j, xrow * scale, zero))

        # rank-1 trailing update of columns l > j: a[:, l] -= tau * v (v·a[:, l])
        at = at_ref[:]
        w = jnp.sum(at * v, axis=1, keepdims=True)  # (n, 1): w_l = v · a[:, l]
        at_ref[:] = at - jnp.where(sub_c > j, tau * w, zero) * v

        # packed column j: R entries above the diagonal kept, beta on it,
        # v tail below it
        at_ref[pl.ds(j, 1), :] = jnp.where(
            lane_r == j, beta, jnp.where(lane_r > j, xrow * scale, xrow)
        )

        # incremental T: z = Vᵀ v_j (rows ≥ j of vt still zero),
        # y_r = Σ_l T[r, l] z_l, column j of T = [-tau*y ; tau].
        z = jnp.sum(vt_ref[:] * v, axis=1, keepdims=True)  # (n, 1)
        y = jnp.sum(tt_ref[:] * z, axis=0, keepdims=True)  # (1, n)
        tt_ref[pl.ds(j, 1), :] = jnp.where(
            lane_c == j, tau, jnp.where(lane_c < j, -tau * y, zero)
        )
        vt_ref[pl.ds(j, 1), :] = v
        return 0

    jax.lax.fori_loop(0, kcols, step, 0, unroll=False)


def _geqrt_kernel(a_ref, packed_ref, t_ref, at_scr, vt_scr, tt_scr):
    m, n = a_ref.shape
    at_scr[:] = a_ref[:].T
    vt_scr[:] = jnp.zeros_like(vt_scr)
    tt_scr[:] = jnp.zeros_like(tt_scr)
    geqrt_in_refs(at_scr, vt_scr, tt_scr, min(m, n))
    packed_ref[:] = at_scr[:].T
    t_ref[:] = tt_scr[:].T


@functools.partial(jax.jit, static_argnames=("interpret",))
def _geqrt_call(a, interpret: bool):
    m, n = a.shape
    return pl.pallas_call(
        _geqrt_kernel,
        out_shape=(
            jax.ShapeDtypeStruct((m, n), a.dtype),
            jax.ShapeDtypeStruct((n, n), a.dtype),
        ),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((n, m), a.dtype),
            pltpu.VMEM((n, m), a.dtype),
            pltpu.VMEM((n, n), a.dtype),
        ],
        interpret=interpret,
    )(a)


def geqrt(a: jnp.ndarray, interpret: bool | None = None):
    """Standalone single-tile GEQRT: a (m, n) → (packed, T). Unit-test entry;
    the drivers use the fused panel kernel (kernels/panel.py) instead."""
    return _geqrt_call(a, resolve_interpret(interpret))
