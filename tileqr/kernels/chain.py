"""Chunked ("tall-couple") panel chain and update kernels.

Performance core of the square driver (SURVEY.md §7.2 item 1). The classic
tiled algorithm eliminates the panel with nb-row TSQRT couples; on TPU the
panel column loop is LATENCY-bound (serial Householder dependency per
column), so the number of column-loop executions is what matters. These
kernels process the sub-diagonal in chunks of c tiles (couple [R; B] with B
of c·nb rows): column-loop executions drop by ~c×, and the trailing update
does 4·c·nb³ + 2nb³ flops per chunk instead of 6·c·nb³ (the T-apply
amortizes) — the same reason LAPACK uses the widest panel that fits cache.
With c = M_rem/nb this degenerates to classic blocked Householder QR; the
tile algebra remains for the chunk boundaries and the distributed tree.

Alignment: Pallas block starts must be multiples of the block shape, so the
chunked couples cover only block-aligned row ranges [align_start, mt) with
align_start = roundup(k+1, c); the 0..c-1 "head" tiles in between are
processed at tile granularity (same kernels with block_rows = nb).

Reflector factors travel in their own stacked arrays (never written back
into A) so that every kernel receives A exactly once — see kernels/panel.py
docstring for why duplicate-operand aliasing forces XLA full-matrix copies.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tileqr.kernels.common import resolve_precision
from tileqr.kernels.geqrt import geqrt_in_refs
from tileqr.kernels.larfb import larfb_body
from tileqr.kernels.ssrfb import ssrfb_body


def _chain_kernel_factory(ib: int):
    def kernel(b_ref, r_in_ref, r_out_ref, v_ref, t2_ref, at_scr, tt_scr):
        nb = r_in_ref.shape[0]
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            r_out_ref[:] = r_in_ref[:]

        at_scr[:, :nb] = r_out_ref[:].T
        at_scr[:, nb:] = b_ref[:].T
        tt_scr[:] = jnp.zeros_like(tt_scr)
        geqrt_in_refs(at_scr, tt_scr, nb, ib=ib)
        r_out_ref[:] = at_scr[:, :nb].T  # strictly-lower stays exactly 0
        v_ref[0] = at_scr[:, nb:].T  # dense V2 chunk
        t2_ref[0] = tt_scr[:].T

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("k", "nb", "base_block", "n_chunks", "block_rows", "ib", "interpret"),
)
def panel_chain(
    a,
    r_in,
    k: int,
    nb: int,
    base_block: int,
    n_chunks: int,
    block_rows: int,
    ib: int = 128,
    interpret: bool = False,
):
    """TSQRT-chain ``n_chunks`` couples of ``block_rows`` rows against the
    carried R (seeded from ``r_in``). A is read-only.

    base_block: first chunk's row-block index in units of block_rows (must be
    block-aligned; the caller routes unaligned head tiles through
    panel_factor first). Returns (r_out, v_chunks, t2_stack).
    """
    m, n = a.shape
    dt = a.dtype
    return pl.pallas_call(
        _chain_kernel_factory(ib),
        grid=(n_chunks,),
        in_specs=[
            pl.BlockSpec(
                (block_rows, nb), lambda i: (base_block + i, k), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((nb, nb), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=(
            jax.ShapeDtypeStruct((nb, nb), dt),
            jax.ShapeDtypeStruct((n_chunks, block_rows, nb), dt),
            jax.ShapeDtypeStruct((n_chunks, nb, nb), dt),
        ),
        out_specs=(
            pl.BlockSpec((nb, nb), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_rows, nb), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nb, nb), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((nb, nb + block_rows), dt),
            pltpu.VMEM((nb, nb), dt),
        ],
        interpret=interpret,
    )(a, r_in)


def _couple_strip_kernel_factory(trans: bool, precision, fuse_larfb: bool,
                                 reverse: bool):
    """fuse_larfb: also apply the diagonal-tile GEQRT block reflector to the
    resident strip — at the first inner step (forward/factor order: LARFB
    precedes the couples) or the last (reverse/Q-apply order: LARFB follows) —
    saving the separate larfb_strip dispatch + strip HBM round-trip."""

    def kernel(*refs):
        if fuse_larfb:
            vkk_ref, tg_ref, v2_ref, t2_ref, strip_in_ref, cbot_ref, c_out_ref, strip_out_ref = refs
        else:
            v2_ref, t2_ref, strip_in_ref, cbot_ref, c_out_ref, strip_out_ref = refs
        ii = pl.program_id(1)

        @pl.when(ii == 0)
        def _():
            s = strip_in_ref[:]
            if fuse_larfb and not reverse:
                s = larfb_body(vkk_ref[:], tg_ref[:], s, trans, precision)
            strip_out_ref[:] = s

        top, bot = ssrfb_body(
            v2_ref[0], t2_ref[0], strip_out_ref[:], cbot_ref[:], trans, precision
        )
        c_out_ref[:] = bot
        if fuse_larfb and reverse:
            last = pl.num_programs(1) - 1

            @pl.when(ii == last)
            def _():
                strip_out_ref[:] = larfb_body(vkk_ref[:], tg_ref[:], top, trans, precision)

            @pl.when(ii != last)
            def _():
                strip_out_ref[:] = top
        else:
            strip_out_ref[:] = top

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=(
        "stack_base", "base_block", "n_chunks", "block_rows", "nb", "col_start",
        "trans", "reverse", "precision", "interpret",
    ),
)
def couple_strip(
    v_stack,
    t2_stack,
    c,
    strip,
    stack_base: int,
    base_block: int,
    n_chunks: int,
    block_rows: int,
    nb: int,
    col_start: int,
    trans: bool = True,
    reverse: bool = False,
    precision: str = "highest",
    interpret: bool = False,
    vkk=None,
    tg=None,
):
    """Apply ``n_chunks`` chunk couples to (strip, C) — the SSRFB sweep with
    the top row strip carried in VMEM across the inner grid dimension.

    v_stack: (B, block_rows, nb) reflector chunks; t2_stack: (B, nb, nb);
    couple ii uses slot stack_base + ii of both. c: (Mc, P) target, passed
    exactly once and aliased in place; its row-blocks base_block + ii (units
    of block_rows) are the couple bottoms. strip: (nb, (Pt-col_start)·nb).
    reverse: iterate chunks descending (Q-apply order).
    vkk/tg: when given, the diagonal-tile LARFB is fused into the sweep
    (first inner step forward, last inner step reverse) instead of needing a
    separate larfb_strip dispatch. Returns (c', strip').
    """
    mc, p = c.shape
    pt = p // nb - col_start
    dt = c.dtype
    if reverse:
        blk_of = lambda ii: base_block + n_chunks - 1 - ii  # noqa: E731
        sl_of = lambda ii: stack_base + n_chunks - 1 - ii  # noqa: E731
    else:
        blk_of = lambda ii: base_block + ii  # noqa: E731
        sl_of = lambda ii: stack_base + ii  # noqa: E731

    fuse_larfb = vkk is not None
    kernel = _couple_strip_kernel_factory(
        trans, resolve_precision(precision), fuse_larfb, reverse
    )
    larfb_specs = (
        [
            pl.BlockSpec((nb, nb), lambda j, ii: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((nb, nb), lambda j, ii: (0, 0), memory_space=pltpu.VMEM),
        ]
        if fuse_larfb
        else []
    )
    larfb_args = (vkk, tg) if fuse_larfb else ()
    n_in = len(larfb_specs)
    return pl.pallas_call(
        kernel,
        grid=(pt, n_chunks),
        in_specs=larfb_specs
        + [
            pl.BlockSpec(
                (1, block_rows, nb), lambda j, ii: (sl_of(ii), 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((1, nb, nb), lambda j, ii: (sl_of(ii), 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((nb, nb), lambda j, ii: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (block_rows, nb),
                lambda j, ii: (blk_of(ii), col_start + j),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_shape=(
            jax.ShapeDtypeStruct((mc, p), dt),
            jax.ShapeDtypeStruct((nb, pt * nb), dt),
        ),
        out_specs=(
            pl.BlockSpec(
                (block_rows, nb), lambda j, ii: (blk_of(ii), col_start + j), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((nb, nb), lambda j, ii: (0, j), memory_space=pltpu.VMEM),
        ),
        input_output_aliases={n_in + 3: 0},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(*larfb_args, v_stack, t2_stack, strip, c)


def _larfb_strip_kernel_factory(trans: bool, precision):
    def kernel(vkk_ref, tg_ref, strip_ref, out_ref):
        out_ref[:] = larfb_body(vkk_ref[:], tg_ref[:], strip_ref[:], trans, precision)

    return kernel


@functools.partial(jax.jit, static_argnames=("nb", "trans", "precision", "interpret"))
def larfb_strip(
    vkk,
    tg,
    strip,
    nb: int,
    trans: bool = True,
    precision: str = "highest",
    interpret: bool = False,
):
    """Apply the diagonal-tile GEQRT reflector block (vkk: packed (nb, nb))
    to the row strip."""
    _, w = strip.shape
    pt = w // nb
    return pl.pallas_call(
        _larfb_strip_kernel_factory(trans, resolve_precision(precision)),
        grid=(pt,),
        in_specs=[
            pl.BlockSpec((nb, nb), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((nb, nb), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((nb, nb), lambda j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_shape=jax.ShapeDtypeStruct((nb, w), strip.dtype),
        out_specs=pl.BlockSpec((nb, nb), lambda j: (0, j), memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(dimension_semantics=("parallel",)),
        interpret=interpret,
    )(vkk, tg, strip)
