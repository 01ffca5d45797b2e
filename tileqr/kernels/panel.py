"""Fused panel-column factorization: GEQRT + the TSQRT head chain in ONE
pallas_call (replaces the reference's per-tile kernel launches + stream/event
DAG for the panel, SURVEY.md §2.1 C7 panel part, §3.1).

Grid = (1 + n_couples,): step 0 runs GEQRT on the diagonal tile, steps i ≥ 1
run the TSQRT couple (R_kk, A[k+i][k]). The evolving R never leaves the chip:
it is carried in the ``r_out`` output buffer, whose constant index map makes
Mosaic keep the same VMEM window across all grid steps (flushed to HBM once).

The reflector factors (packed GEQRT tile + dense V2 tiles) are emitted as a
SEPARATE stacked output rather than written back into A: downstream couple
kernels then receive A exactly once (as the aliased in/out operand) — passing
A both as V-source and as aliased target makes XLA insert a defensive
full-matrix copy per call (the buffer cannot simultaneously alias the output
and serve another read operand), which dominated the runtime at 8192².
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tileqr.kernels.common import triu
from tileqr.kernels.geqrt import geqrt_in_refs


def _mk_panel_kernel(ib: int):
    def _panel_kernel(a_pan_ref, r_out_ref, v_ref, tg_ref, t2_ref, at_scr, tt_scr):
        nb = a_pan_ref.shape[0]
        i = pl.program_id(0)
        is_first = i == 0

        # top lanes: the diagonal tile itself (GEQRT step) or the carried R;
        # bottom lanes: zero (GEQRT step — masked ops never see them) or the
        # sub-diagonal tile (TSQRT couple).
        top = jnp.where(is_first, a_pan_ref[:].T, r_out_ref[:].T)
        bot = jnp.where(is_first, jnp.zeros_like(a_pan_ref[:].T), a_pan_ref[:].T)
        at_scr[:, :nb] = top
        at_scr[:, nb:] = bot
        tt_scr[:] = jnp.zeros_like(tt_scr)

        geqrt_in_refs(at_scr, tt_scr, nb, ib=ib)

        # carried R: at step 0 the packed top holds v's below the diagonal →
        # mask; at later steps the strictly-lower part is exactly zero.
        r_out_ref[:] = triu(at_scr[:, :nb].T)

        # reflector stack: slot 0 = packed GEQRT tile (R + v's), slots 1.. =
        # dense V2 of each couple
        v_ref[0] = jnp.where(is_first, at_scr[:, :nb].T, at_scr[:, nb:].T)

        @pl.when(is_first)
        def _():
            tg_ref[:] = tt_scr[:].T
            t2_ref[0] = jnp.zeros_like(t2_ref[0])

        @pl.when(jnp.logical_not(is_first))
        def _():
            t2_ref[0] = tt_scr[:].T

    return _panel_kernel


@functools.partial(jax.jit, static_argnames=("k", "nb", "ib", "n_couples", "interpret"))
def panel_factor(
    a, k: int, nb: int, ib: int = 128, n_couples: int | None = None, interpret: bool = False
):
    """Factor panel column k of A (read-only): GEQRT on tile (k, k) plus the
    TSQRT chain over the next ``n_couples`` sub-diagonal tiles (default: the
    whole column; the chunked driver passes only the unaligned head and
    routes the rest through kernels/chain.py).

    Returns (r_kk, v_stack, t_geqrt, t2_stack): v_stack (1+n_couples, nb, nb)
    holds the packed GEQRT tile at slot 0 and dense V2 tiles after; t2_stack
    slot 0 is unused.
    """
    m, n = a.shape
    if not interpret and nb % 128 != 0:
        raise ValueError(
            f"nb={nb} must be a multiple of 128 for compiled TPU kernels "
            "(lane alignment); smaller nb runs only in interpret mode"
        )
    mt = m // nb
    mt_rem = (mt - k) if n_couples is None else (1 + n_couples)
    dt = a.dtype
    return pl.pallas_call(
        _mk_panel_kernel(ib),
        grid=(mt_rem,),
        in_specs=[
            pl.BlockSpec((nb, nb), lambda i: (k + i, k), memory_space=pltpu.VMEM),
        ],
        out_shape=(
            jax.ShapeDtypeStruct((nb, nb), dt),
            jax.ShapeDtypeStruct((mt_rem, nb, nb), dt),
            jax.ShapeDtypeStruct((nb, nb), dt),
            jax.ShapeDtypeStruct((mt_rem, nb, nb), dt),
        ),
        out_specs=(
            pl.BlockSpec((nb, nb), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nb, nb), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((nb, nb), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nb, nb), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((nb, 2 * nb), dt),
            pltpu.VMEM((nb, nb), dt),
        ],
        interpret=interpret,
    )(a)
