"""Fused trailing-matrix / apply-Q sweep: LARFB + the full SSRFB couple sweep
in ONE pallas_call (the reference's hot loop, SURVEY.md §3.1; replaces its
per-tile CUDA launches + stream DAG, component C7 update part).

Grid = (column-tiles, couple-rows), inner dimension iterating couples: for a
fixed target column-tile j, the top row tile C[k][j] stays resident in VMEM
(the ``row_out`` output buffer with block index (0, j) is revisited across
the whole inner sweep and flushed once when j advances), while each couple's
(V2, T2, C[i][j]) streams through double-buffered VMEM windows. HBM traffic
per panel: every trailing tile read+written exactly once, the panel column
re-read once per column-tile — arithmetic intensity ≈ nb/3 flops/byte, MXU-
bound for nb ≥ 256.

One kernel serves all four reflector sweeps via static params:
  * trailing update (factorization): trans=True, forward, c IS the matrix
  * apply Qᵀ to C: trans=True, forward
  * apply Q to C: trans=False, reverse couple order (LARFB last)
(LAPACK xTSMQR/xORMQR ordering on the tiled factors.)
"""

from __future__ import annotations

import functools

import jax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tileqr.kernels.common import resolve_precision
from tileqr.kernels.larfb import larfb_body
from tileqr.kernels.ssrfb import ssrfb_body


def _mk_couple_kernel(n_inner: int, trans: bool, reverse: bool, precision):
    def kernel(vkk_ref, tg_ref, v2_ref, t2_ref, ctop_ref, cbot_ref, c_out_ref, row_out_ref):
        ii = pl.program_id(1)

        if not reverse:
            # LARFB first (fresh load of the top tile), couples ascending.
            @pl.when(ii == 0)
            def _():
                row_out_ref[:] = larfb_body(
                    vkk_ref[:], tg_ref[:], ctop_ref[:], trans, precision
                )

            top, bot = ssrfb_body(
                v2_ref[:], t2_ref[0], row_out_ref[:], cbot_ref[:], trans, precision
            )
            row_out_ref[:] = top
            c_out_ref[:] = bot
        else:
            # couples descending (index maps handle the reversal), LARFB last.
            @pl.when(ii == 0)
            def _():
                row_out_ref[:] = ctop_ref[:]

            top, bot = ssrfb_body(
                v2_ref[:], t2_ref[0], row_out_ref[:], cbot_ref[:], trans, precision
            )
            c_out_ref[:] = bot

            @pl.when(ii == n_inner - 1)
            def _():
                row_out_ref[:] = larfb_body(vkk_ref[:], tg_ref[:], top, trans, precision)

            @pl.when(ii != n_inner - 1)
            def _():
                row_out_ref[:] = top

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("k", "col_start", "nb", "trans", "reverse", "precision", "interpret"),
)
def couple_apply(
    packed,
    tg,
    t2stack,
    c,
    k: int,
    col_start: int,
    nb: int,
    trans: bool = True,
    reverse: bool = False,
    precision: str = "highest",
    interpret: bool = False,
):
    """Apply panel k's reflectors to column-tiles [col_start, Pt) of c.

    packed: (M, N) factored matrix (V source); tg: (nb, nb) GEQRT T;
    t2stack: (Mt-k, nb, nb) TSQRT T2s (slot 0 unused); c: (M, P) target.
    Returns (c', row_strip): c' aliased to c with rows below k·nb updated;
    row_strip (nb, (Pt-col_start)·nb) is the updated top row tile strip,
    which the caller splices back into row k of c.
    """
    m, _n = packed.shape
    mc, p = c.shape
    mt = m // nb
    pt = p // nb - col_start
    n_inner = mt - k - 1
    assert n_inner >= 1 and pt >= 1
    dt = c.dtype

    if reverse:
        row_of = lambda ii: mt - 1 - ii  # noqa: E731
        t2_of = lambda ii: n_inner - ii  # noqa: E731
    else:
        row_of = lambda ii: k + 1 + ii  # noqa: E731
        t2_of = lambda ii: ii + 1  # noqa: E731

    grid = (pt, n_inner)
    kernel = _mk_couple_kernel(n_inner, trans, reverse, resolve_precision(precision))
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((nb, nb), lambda j, ii: (k, k), memory_space=pltpu.VMEM),
            pl.BlockSpec((nb, nb), lambda j, ii: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((nb, nb), lambda j, ii: (row_of(ii), k), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nb, nb), lambda j, ii: (t2_of(ii), 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((nb, nb), lambda j, ii: (k, col_start + j), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (nb, nb), lambda j, ii: (row_of(ii), col_start + j), memory_space=pltpu.VMEM
            ),
        ],
        out_shape=(
            jax.ShapeDtypeStruct((mc, p), dt),
            jax.ShapeDtypeStruct((nb, pt * nb), dt),
        ),
        out_specs=(
            pl.BlockSpec(
                (nb, nb), lambda j, ii: (row_of(ii), col_start + j), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((nb, nb), lambda j, ii: (0, j), memory_space=pltpu.VMEM),
        ),
        input_output_aliases={5: 0},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(packed, tg, packed, t2stack, c, c)


# (A LARFB-only row sweep for the no-couples case is not needed: the
# drivers route that case through kernels/chain.py:larfb_strip.)
