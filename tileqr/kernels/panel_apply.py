"""Whole-panel block-reflector apply — the hr drivers' trailing update as a
Pallas kernel (C ← (I − Y·T·Yᵀ)^{T?}·C with Y a TALL (m, nb) panel).

Reference mapping: this is LARFB (SURVEY.md §2.1 C2) lifted from nb×nb
tiles to whole panels — the shape the Householder-reconstruction drivers
(drivers/square_hr.py) produce. The XLA-level form (three jnp matmuls) is
what ships for precision="highest", and it is already at that path's
ceiling (measured 31.9 TFLOP/s on the 8192-row update shape — the tall-thin
contraction's bf16 roof is 58.5, and HIGHEST's six passes run fused with
VMEM operand reuse). This kernel exists for the 3-pass bf16 emulation
(precision="b3"): at the XLA level the three emulation dots are separate
HLO ops that each re-read HBM and the split operands must be materialized
— measured 20.2 TFLOP/s, SLOWER than highest (BASELINE.md r3, the full
negative-result chain). In-kernel, the split happens once per VMEM block
and the three MXU passes reuse it, so the emulation finally banks its 2×.

Two-phase structure (a true barrier separates them: every row block of Y
contributes to W before any C block can be updated):

  phase 1 (projection):  W = Tᵀ·(Yᵀ·C)   — grid (nj, mi), mi innermost,
      accumulating Yᵢᵀ·Cᵢⱼ in a VMEM scratch across the mi steps and
      folding the small T product in at the last one.
  phase 2 (apply):       C ← C − Y·W     — grid (nj, mi), input/output
      aliased (no copy of the trailing matrix).

HBM traffic: C is read twice and written once (same as the XLA form); Y is
read twice.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tileqr.kernels.common import (
    dot,
    dot_t,
    resolve_interpret,
    resolve_precision,
)


def _kahan_add(acc_ref, comp_ref, val):
    """Compensated accumulation acc += val across grid steps: the W
    projection sums m/mr block partials sequentially in fp32, which is the
    √(m/mr)·eps term of the hr paths' measured √m backward-error growth
    (BASELINE.md r3 pairwise probe). Kahan's compensation drops the
    cross-block term to O(eps) for 3 VPU adds per block — noise next to
    the MXU contraction. Mosaic emits the float ops as written (no
    reassociation), so the (t − acc) − y cancellation is preserved;
    pinned by test_panel_apply_kahan_accumulation."""
    y = val - comp_ref[...]
    t = acc_ref[...] + y
    comp_ref[...] = (t - acc_ref[...]) - y
    acc_ref[...] = t


def _mk_w_kernel(precision):
    def kernel(tm_ref, y_ref, c_ref, w_ref, acc_ref, comp_ref):
        i = pl.program_id(1)

        @pl.when(i == 0)
        def _init():
            acc_ref[...] = jnp.zeros_like(acc_ref)
            comp_ref[...] = jnp.zeros_like(comp_ref)

        _kahan_add(acc_ref, comp_ref, dot_t(y_ref[...], c_ref[...], precision))

        @pl.when(i == pl.num_programs(1) - 1)
        def _fold_t():
            # the nb×nb T product is negligible work — keep it HIGHEST so
            # the emulation error lives only in the two large contractions
            w_ref[...] = dot(
                tm_ref[...], acc_ref[...].astype(tm_ref.dtype), "highest"
            )

    return kernel


def _mk_apply_kernel(precision):
    def kernel(y_ref, w_ref, c_ref, o_ref):
        o_ref[...] = c_ref[...] - dot(y_ref[...], w_ref[...], precision)

    return kernel


def _block(extent: int, unit: int, target: int) -> int:
    """Largest multiple of ``unit`` that divides ``extent`` and is ≤ max(
    target, unit) — block sizes must tile the (nb-multiple) window exactly."""
    best = unit
    g = target // unit
    while g > 1:
        if extent % (g * unit) == 0:
            return g * unit
        g -= 1
    return best


@functools.partial(
    jax.jit, static_argnames=("trans", "precision", "interpret", "mr", "nc")
)
def _panel_apply_call(y, tm, c, trans, precision, interpret, mr, nc):
    m, nb = y.shape
    n = c.shape[1]
    dt = c.dtype
    prec = resolve_precision(precision)
    grid = (n // nc, m // mr)
    w = pl.pallas_call(
        _mk_w_kernel(prec),
        grid=grid,
        in_specs=[
            pl.BlockSpec((nb, nb), lambda j, i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((mr, nb), lambda j, i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((mr, nc), lambda j, i: (i, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (nb, nc), lambda j, i: (0, j), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((nb, n), dt),
        scratch_shapes=[
            pltpu.VMEM((nb, nc), jnp.float32),  # acc
            pltpu.VMEM((nb, nc), jnp.float32),  # Kahan compensation
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")
        ),
        interpret=interpret,
    )(tm, y, c)
    return pl.pallas_call(
        _mk_apply_kernel(prec),
        grid=grid,
        in_specs=[
            pl.BlockSpec((mr, nb), lambda j, i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((nb, nc), lambda j, i: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((mr, nc), lambda j, i: (i, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (mr, nc), lambda j, i: (i, j), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((m, n), dt),
        input_output_aliases={2: 0},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")
        ),
        interpret=interpret,
    )(y, w, c)


def panel_apply(y, t, c, trans: bool = True, precision: str = "b3",
                interpret=None, mr: int = 1024, nc: int = 512):
    """C ← (I − Y·T·Yᵀ)ᵀ C (trans) or (I − Y·T·Yᵀ) C.

    y: (m, nb) whole-panel reflectors (unit lower trapezoidal, as produced
    by the hr reconstruction); t: (nb, nb) upper-triangular compact-WY
    factor; c: (m, n) with m, n multiples of nb. mr/nc are block-size
    TARGETS — clamped to divisors of the actual extents."""
    m, nb = y.shape
    mc, n = c.shape
    if mc != m:
        raise ValueError(f"c rows {mc} != y rows {m}")
    if n == 0:
        return c
    tm = jnp.transpose(t) if trans else t
    mr_eff = _block(m, nb, mr)
    nc_eff = _block(n, nb, nc)
    return _panel_apply_call(
        y, tm, c, trans, precision, resolve_interpret(interpret),
        mr_eff, nc_eff,
    )


# same accumulation contract as the value-level W kernel (the carry form
# differs only in how C blocks are addressed, which lives in the BlockSpecs)
_mk_w_carry_kernel = _mk_w_kernel


def panel_apply_carry(y, t, carry, k: int, nb: int, trans: bool = True,
                      precision: str = "b3", interpret: bool = False):
    """In-place windowed block-reflector apply on the FULL carry matrix:
    carry[s:, s+nb:] ← (I − Y·T·Yᵀ)^{T?}·carry[s:, s+nb:], s = k·nb, with
    everything outside the window passing through untouched (aliased).

    This exists because the value-level form pays TWO full-window copies
    per panel around a pallas_call: `trail[:, nb:]` must be materialized
    (Pallas cannot fuse producer slices the way XLA dots do) and the next
    panel's `c[nb:]` row slice materializes again — ~4 extra HBM passes
    that erased the in-kernel b3 win (BASELINE.md r3: 37.4 ms ≈ highest's
    37.1 at 8192²). Here the window is addressed by nb-block offsets in
    the carry's own buffer: k·nb is always an integral block offset, so no
    slice ever materializes and phase 2 aliases the carry in place.

    Phase 1 iterates (nj, mi) with mi innermost (W accumulates per column
    block in VMEM scratch); Y row blocks are refetched per column block —
    the price of nb-wide column blocks (window widths/offsets are only
    guaranteed nb-aligned). Phase 2 iterates (mi, nj) with nj innermost:
    the Y block index is constant across the inner loop, so Mosaic elides
    the refetch. Reduction order over mi blocks differs from one XLA dot
    (fp32 scratch accumulation per nb rows), so this path is NOT
    bitwise-equal to the XLA update — values agree to fp32 rounding."""
    from jax._src.pallas import core as _pcore

    m, nbv = y.shape
    if nbv != nb:
        raise ValueError(f"y cols {nbv} != nb {nb}")
    mp, npad = carry.shape
    s = k * nb
    if (mp - s) != m:
        raise ValueError(f"window rows {mp - s} != y rows {m}")
    n = npad - s - nb
    if n <= 0:
        return carry
    dt = carry.dtype
    prec = resolve_precision(precision)
    # Element windows (validated on this TPU stack incl. aliased partial
    # writes): the carry blocks are addressed by ELEMENT offsets, so the
    # block size only has to divide the window EXTENT, not its offset —
    # nb×nb blocks (the blocked-index fallback) cost 1.5× in grid-step
    # overhead (31.5 vs 47.4 TFLOP/s isolated b3).
    mr = _block(m, nb, 512)
    nc = _block(n, nb, 512)
    co = s + nb
    tm = jnp.transpose(t) if trans else t
    w = pl.pallas_call(
        _mk_w_carry_kernel(prec),
        grid=(n // nc, m // mr),
        in_specs=[
            pl.BlockSpec((nb, nb), lambda j, i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((mr, nb), lambda j, i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (_pcore.Element(mr), _pcore.Element(nc)),
                lambda j, i, s=s, co=co, mr=mr, nc=nc: (
                    pl.multiple_of(s + i * mr, nb), pl.multiple_of(co + j * nc, nb)
                ),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (nb, nc), lambda j, i: (0, j), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((nb, n), dt),
        scratch_shapes=[
            pltpu.VMEM((nb, nc), jnp.float32),  # acc
            pltpu.VMEM((nb, nc), jnp.float32),  # Kahan compensation
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")
        ),
        interpret=interpret,
    )(tm, y, carry)
    return pl.pallas_call(
        _mk_apply_kernel(prec),
        grid=(m // mr, n // nc),
        in_specs=[
            pl.BlockSpec((mr, nb), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((nb, nc), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (_pcore.Element(mr), _pcore.Element(nc)),
                lambda i, j, s=s, co=co, mr=mr, nc=nc: (
                    pl.multiple_of(s + i * mr, nb), pl.multiple_of(co + j * nc, nb)
                ),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (_pcore.Element(mr), _pcore.Element(nc)),
            lambda i, j, s=s, co=co, mr=mr, nc=nc: (
                pl.multiple_of(s + i * mr, nb), pl.multiple_of(co + j * nc, nb)
            ),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((mp, npad), dt),
        input_output_aliases={2: 0},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")
        ),
        interpret=interpret,
    )(y, w, carry)


def _mk_project_kernel(precision):
    def kernel(y_ref, c_ref, w_ref, acc_ref, comp_ref):
        i = pl.program_id(1)

        @pl.when(i == 0)
        def _init():
            acc_ref[...] = jnp.zeros_like(acc_ref)
            comp_ref[...] = jnp.zeros_like(comp_ref)

        _kahan_add(acc_ref, comp_ref, dot_t(y_ref[...], c_ref[...], precision))

        @pl.when(i == pl.num_programs(1) - 1)
        def _out():
            w_ref[...] = acc_ref[...].astype(w_ref.dtype)

    return kernel


@functools.partial(jax.jit, static_argnames=("precision", "interpret", "mr", "nc"))
def _panel_project_call(y, c, precision, interpret, mr, nc):
    m, nb = y.shape
    n = c.shape[1]
    prec = resolve_precision(precision)
    return pl.pallas_call(
        _mk_project_kernel(prec),
        grid=(n // nc, m // mr),
        in_specs=[
            pl.BlockSpec((mr, nb), lambda j, i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((mr, nc), lambda j, i: (i, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (nb, nc), lambda j, i: (0, j), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((nb, n), c.dtype),
        scratch_shapes=[
            pltpu.VMEM((nb, nc), jnp.float32),  # acc
            pltpu.VMEM((nb, nc), jnp.float32),  # Kahan compensation
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")
        ),
        interpret=interpret,
    )(y, c)


def panel_project(y, c, precision: str = "b3", interpret=None):
    """W_partial = Yᵀ·C — the projection half of the whole-panel apply,
    split out so a cross-device reduction (psum over mesh rows) can sit
    between it and ``panel_sub``: the sharded hr driver's update is
    W = psum_rows(YᵀC) → T·W → C − Y·W (drivers/sharded_hr.py)."""
    m, nb = y.shape
    mc, n = c.shape
    if mc != m:
        raise ValueError(f"c rows {mc} != y rows {m}")
    return _panel_project_call(
        y, c, precision, resolve_interpret(interpret),
        _block(m, nb, 512), _block(n, nb, 512),
    )


@functools.partial(jax.jit, static_argnames=("precision", "interpret", "mr", "nc"))
def _panel_sub_call(y, w, c, precision, interpret, mr, nc):
    m, nb = y.shape
    n = c.shape[1]
    prec = resolve_precision(precision)
    return pl.pallas_call(
        _mk_apply_kernel(prec),
        grid=(m // mr, n // nc),
        in_specs=[
            pl.BlockSpec((mr, nb), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((nb, nc), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((mr, nc), lambda i, j: (i, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (mr, nc), lambda i, j: (i, j), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((m, n), c.dtype),
        input_output_aliases={2: 0},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")
        ),
        interpret=interpret,
    )(y, w, c)


def panel_sub(y, w, c, precision: str = "b3", interpret=None):
    """C ← C − Y·W (aliased in place) — the apply half of the split form;
    see panel_project."""
    m, nb = y.shape
    mc, n = c.shape
    if mc != m:
        raise ValueError(f"c rows {mc} != y rows {m}")
    return _panel_sub_call(
        y, w, c, precision, resolve_interpret(interpret),
        _block(m, nb, 512), _block(n, nb, 512),
    )
