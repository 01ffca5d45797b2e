"""Bounded-compile right-looking tiled QR (SURVEY.md §7.2 item 3 fallback,
VERDICT r1 next-#7): the trace-unrolled driver (drivers/square.py) emits
O(k_max) pallas_calls with per-panel shapes — at 16384² (64 panels) first
compile costs ~45 min through this environment's remote-compile service and
grows superlinearly toward 32768² (128 panels). This driver compiles O(1)
kernels total: a ``lax.fori_loop`` over panels drives FOUR Mosaic kernels
whose grid sizes and block offsets are RUNTIME values (Pallas TPU dynamic
grids + ``PrefetchScalarGridSpec`` scalar-driven index maps), so one
executable serves every panel k.

Differences from the static driver (same tile algebra, same numerics per
couple):
  * the row-k strip travels as the FULL (nb, N) row with only columns right
    of the panel visited (aliased in/out pass-through keeps the rest);
  * the diagonal-tile LARFB is a separate (dynamic-grid) sweep rather than
    fused into the first couple sweep — fusion would need a data-dependent
    "who carries the LARFB" branch;
  * reflector factors land in flat preallocated buffers (aliased pallas
    outputs with scalar-offset index maps — no per-panel copies):
    v_heads (k_max, c, nb, nb) slot 0 = packed GEQRT tile, v_chunks
    (Σ nc(k), c·nb, nb) at per-panel offsets from a static chunk-base table.

Zero-trip dynamic grids (tail panels with no head/chunks/trailing columns)
execute no grid steps and, with aliasing, pass buffers through unchanged.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tileqr.drivers.square import _chunk_for, _segments
from tileqr.kernels.chain import _chain_kernel_factory, _couple_strip_kernel_factory
from tileqr.kernels.common import resolve_precision
from tileqr.kernels.larfb import larfb_body
from tileqr.kernels.panel import _mk_panel_kernel


class DynFactors(NamedTuple):
    """Flat-buffer tiled-QR factors of the dynamic driver.

    Registered as a jax pytree with (nb, chunk, shape) as static aux data —
    see TSQRFactors (drivers/tsqr.py) for why factors must cross jit
    boundaries as arguments with their int fields kept static."""

    r_diag: jnp.ndarray  # (k_max, nb, nb)
    t_geqrt: jnp.ndarray  # (k_max, nb, nb)
    v_heads: jnp.ndarray  # (k_max, c, nb, nb); slot 0 = packed GEQRT tile
    t2_heads: jnp.ndarray  # (k_max, c, nb, nb)
    v_chunks: jnp.ndarray  # (total_nc, c*nb, nb)
    t2_chunks: jnp.ndarray  # (total_nc, nb, nb)
    nb: int
    chunk: int
    shape: Tuple[int, int]


jax.tree_util.register_pytree_node(
    DynFactors,
    lambda f: (tuple(f[:6]), (f.nb, f.chunk, f.shape)),
    lambda aux, ch: DynFactors(*ch, *aux),
)


def _chunk_bases(mt: int, nt: int, c: int):
    """Static per-panel offsets into the flat v_chunks buffer."""
    bases, acc = [], 0
    for k in range(min(mt, nt)):
        bases.append(acc)
        acc += _segments(k, mt, c)[2]
    return bases, acc


def _panel_factor_dyn(a, k, n_head, nb: int, c: int, ib: int, interpret: bool):
    """GEQRT + head TSQRT chain; grid (1 + n_head) dynamic, k dynamic."""
    m, n = a.shape
    dt = a.dtype
    inner = _mk_panel_kernel(ib)
    gs = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1 + n_head,),
        in_specs=[
            pl.BlockSpec((nb, nb), lambda i, s: (s[0] + i, s[0])),
        ],
        out_specs=(
            pl.BlockSpec((nb, nb), lambda i, s: (0, 0)),
            pl.BlockSpec((1, nb, nb), lambda i, s: (i, 0, 0)),
            pl.BlockSpec((nb, nb), lambda i, s: (0, 0)),
            pl.BlockSpec((1, nb, nb), lambda i, s: (i, 0, 0)),
        ),
        scratch_shapes=[
            pltpu.VMEM((nb, 2 * nb), dt),
            pltpu.VMEM((nb, nb), dt),
        ],
    )
    return pl.pallas_call(
        lambda s, *refs: inner(*refs),
        grid_spec=gs,
        out_shape=(
            jax.ShapeDtypeStruct((nb, nb), dt),
            jax.ShapeDtypeStruct((c, nb, nb), dt),
            jax.ShapeDtypeStruct((nb, nb), dt),
            jax.ShapeDtypeStruct((c, nb, nb), dt),
        ),
        interpret=interpret,
    )(jnp.array([k], jnp.int32), a)


def _panel_chain_dyn(a, r_in, vch, t2ch, k, base_blk, nch, cb,
                     nb: int, c: int, ib: int, interpret: bool):
    """Chunk-couple chain; grid (nch) dynamic; V2/T2 written in place into
    the flat carry buffers at slot offset cb (aliased outputs)."""
    m, n = a.shape
    dt = a.dtype
    total_nc = vch.shape[0]
    inner = _chain_kernel_factory(ib)

    def kernel(s, a_blk, r_in_ref, vch_in, t2ch_in, r_out, vch_out, t2ch_out,
               at_scr, tt_scr):
        del vch_in, t2ch_in
        inner(a_blk, r_in_ref, r_out, vch_out, t2ch_out, at_scr, tt_scr)

    gs = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nch,),
        in_specs=[
            pl.BlockSpec((c * nb, nb), lambda i, s: (s[1] + i, s[0])),
            pl.BlockSpec((nb, nb), lambda i, s: (0, 0)),
            pl.BlockSpec((1, c * nb, nb), lambda i, s: (s[2] + i, 0, 0)),
            pl.BlockSpec((1, nb, nb), lambda i, s: (s[2] + i, 0, 0)),
        ],
        out_specs=(
            pl.BlockSpec((nb, nb), lambda i, s: (0, 0)),
            pl.BlockSpec((1, c * nb, nb), lambda i, s: (s[2] + i, 0, 0)),
            pl.BlockSpec((1, nb, nb), lambda i, s: (s[2] + i, 0, 0)),
        ),
        scratch_shapes=[
            pltpu.VMEM((nb, nb + c * nb), dt),
            pltpu.VMEM((nb, nb), dt),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=gs,
        out_shape=(
            jax.ShapeDtypeStruct((nb, nb), dt),
            jax.ShapeDtypeStruct((total_nc, c * nb, nb), dt),
            jax.ShapeDtypeStruct((total_nc, nb, nb), dt),
        ),
        input_output_aliases={3: 1, 4: 2},
        interpret=interpret,
    )(jnp.array([k, base_blk, cb], jnp.int32), a, r_in, vch, t2ch)


def _larfb_strip_dyn(vkk, tg, strip, col_off, pt, nb: int, trans: bool,
                     precision, interpret: bool):
    """LARFB over strip columns [col_off, col_off + pt); others pass through
    (aliased)."""
    _nb, w = strip.shape
    dt = strip.dtype

    def kernel(s, vkk_ref, tg_ref, strip_in, strip_out):
        strip_out[:] = larfb_body(vkk_ref[:], tg_ref[:], strip_in[:], trans, precision)

    gs = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(pt,),
        in_specs=[
            pl.BlockSpec((nb, nb), lambda j, s: (0, 0)),
            pl.BlockSpec((nb, nb), lambda j, s: (0, 0)),
            pl.BlockSpec((nb, nb), lambda j, s: (0, s[0] + j)),
        ],
        out_specs=pl.BlockSpec((nb, nb), lambda j, s: (0, s[0] + j)),
    )
    return pl.pallas_call(
        kernel,
        grid_spec=gs,
        out_shape=jax.ShapeDtypeStruct((nb, w), dt),
        input_output_aliases={3: 0},
        interpret=interpret,
    )(jnp.array([col_off], jnp.int32), vkk, tg, strip)


def _couple_strip_dyn(v_src, t2_src, c_mat, strip, sl_off, blk_off, n_inner,
                      col_off, pt, block_rows: int, nb: int, trans: bool,
                      reverse: bool, precision, interpret: bool):
    """SSRFB sweep, dynamic twin of kernels/chain.py:couple_strip (no fused
    LARFB). strip is the FULL row; columns outside [col_off, col_off+pt)
    pass through via aliasing. c_mat aliased in place."""
    mc, p = c_mat.shape
    _nb, w = strip.shape
    dt = c_mat.dtype
    inner = _couple_strip_kernel_factory(trans, precision, False, reverse)

    def kernel(s, v2_ref, t2_ref, strip_in, cbot_ref, c_out, strip_out):
        inner(v2_ref, t2_ref, strip_in, cbot_ref, c_out, strip_out)

    if reverse:
        sl = lambda ii, s: s[0] + s[2] - 1 - ii  # noqa: E731
        blk = lambda ii, s: s[1] + s[2] - 1 - ii  # noqa: E731
    else:
        sl = lambda ii, s: s[0] + ii  # noqa: E731
        blk = lambda ii, s: s[1] + ii  # noqa: E731

    gs = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(pt, n_inner),
        in_specs=[
            pl.BlockSpec((1, block_rows, nb), lambda j, ii, s: (sl(ii, s), 0, 0)),
            pl.BlockSpec((1, nb, nb), lambda j, ii, s: (sl(ii, s), 0, 0)),
            pl.BlockSpec((nb, nb), lambda j, ii, s: (0, s[3] + j)),
            pl.BlockSpec((block_rows, nb), lambda j, ii, s: (blk(ii, s), s[3] + j)),
        ],
        out_specs=(
            pl.BlockSpec((block_rows, nb), lambda j, ii, s: (blk(ii, s), s[3] + j)),
            pl.BlockSpec((nb, nb), lambda j, ii, s: (0, s[3] + j)),
        ),
    )
    return pl.pallas_call(
        kernel,
        grid_spec=gs,
        out_shape=(
            jax.ShapeDtypeStruct((mc, p), dt),
            jax.ShapeDtypeStruct((nb, w), dt),
        ),
        # operand order: scalars(0), v_src(1), t2_src(2), strip(3), c(4)
        input_output_aliases={4: 0, 3: 1},
        interpret=interpret,
    )(jnp.array([sl_off, blk_off, n_inner, col_off], jnp.int32),
      v_src, t2_src, strip, c_mat)


def qr_tiled_dyn(
    a: jnp.ndarray,
    nb: int,
    ib: int = 128,
    chunk: int = 4,
    precision: str = "highest",
    interpret: bool = False,
    donate: bool = False,
):
    """Factor A (M, N; multiples of nb). Same tile algebra as qr_tiled but
    with an O(1)-kernel fori_loop driver. Returns (a, DynFactors).

    donate=True invalidates the caller's A and lets XLA reuse its buffer —
    required at 32768² fp32 on one v5e chip, where factors + carry are
    ~11.5 GiB and holding the 4 GiB input alongside exceeds HBM
    (BASELINE.md r2 dynamic-driver scale notes)."""
    m, n = a.shape
    f = _qr_tiled_dyn_jit_donated if donate else _qr_tiled_dyn_jit
    out = f(a, nb, ib, chunk, precision, interpret)
    a_out, r_diag, tg_all, vh, t2h, vch, t2ch = out
    c = _chunk_for(m // nb, chunk)
    return a_out, DynFactors(r_diag, tg_all, vh, t2h, vch, t2ch, nb, c, (m, n))


def _qr_tiled_dyn_impl(
    a: jnp.ndarray,
    nb: int,
    ib: int = 128,
    chunk: int = 4,
    precision: str = "highest",
    interpret: bool = False,
):
    m, n = a.shape
    mt, nt = m // nb, n // nb
    k_max = min(mt, nt)
    c = _chunk_for(mt, chunk)
    prec = resolve_precision(precision)
    dt = a.dtype

    bases, total_nc = _chunk_bases(mt, nt, c)
    base_tab = jnp.asarray(bases, jnp.int32)

    r_diag = jnp.zeros((k_max, nb, nb), dt)
    tg_all = jnp.zeros((k_max, nb, nb), dt)
    vh = jnp.zeros((k_max, c, nb, nb), dt)
    t2h = jnp.zeros((k_max, c, nb, nb), dt)
    vch = jnp.zeros((max(total_nc, 1), c * nb, nb), dt)
    t2ch = jnp.zeros((max(total_nc, 1), nb, nb), dt)

    def body(k, carry):
        a, r_diag, tg_all, vh, t2h, vch, t2ch = carry
        rem = mt - k - 1
        n_head = jnp.minimum((c - (k + 1) % c) % c, rem)
        align = k + 1 + n_head
        nch = (mt - align) // c
        cb = base_tab[k]

        r_k, v_stack, tg_k, t2_stack = _panel_factor_dyn(
            a, k, n_head, nb, c, ib, interpret
        )
        r_k2, vch, t2ch = _panel_chain_dyn(
            a, r_k, vch, t2ch, k, align // c, nch, cb, nb, c, ib, interpret
        )
        r_k = jnp.where(nch > 0, r_k2, r_k)

        pt = nt - k - 1
        strip = jax.lax.dynamic_slice(a, (k * nb, 0), (nb, n))
        strip = _larfb_strip_dyn(
            v_stack[0], tg_k, strip, k + 1, pt, nb, True, prec, interpret
        )
        a, strip = _couple_strip_dyn(
            v_stack, t2_stack, a, strip, 1, k + 1, n_head, k + 1, pt,
            nb, nb, True, False, prec, interpret,
        )
        a, strip = _couple_strip_dyn(
            vch, t2ch, a, strip, cb, align // c, nch, k + 1, pt,
            c * nb, nb, True, False, prec, interpret,
        )
        a = jax.lax.dynamic_update_slice(a, strip, (k * nb, 0))

        r_diag = jax.lax.dynamic_update_slice(r_diag, r_k[None], (k, 0, 0))
        tg_all = jax.lax.dynamic_update_slice(tg_all, tg_k[None], (k, 0, 0))
        vh = jax.lax.dynamic_update_slice(vh, v_stack[None], (k, 0, 0, 0))
        t2h = jax.lax.dynamic_update_slice(t2h, t2_stack[None], (k, 0, 0, 0))
        return a, r_diag, tg_all, vh, t2h, vch, t2ch

    return jax.lax.fori_loop(
        0, k_max, body, (a, r_diag, tg_all, vh, t2h, vch, t2ch)
    )


_STATIC = ("nb", "ib", "chunk", "precision", "interpret")
_qr_tiled_dyn_jit = functools.partial(jax.jit, static_argnames=_STATIC)(
    _qr_tiled_dyn_impl
)
_qr_tiled_dyn_jit_donated = functools.partial(
    jax.jit, static_argnames=_STATIC, donate_argnums=0
)(_qr_tiled_dyn_impl)


def apply_q_tiled_dyn(
    f: DynFactors,
    c_mat: jnp.ndarray,
    trans: bool = True,
    precision: str = "highest",
    interpret: bool = False,
    triangular: bool = False,
):
    """C ← Qᵀ C (trans) or Q C from DynFactors. c_mat: (M, P), P % nb == 0.
    (Not wrapped in jit itself: the fori_loop body already lowers to one
    XLA while over O(1) kernels; f's nb/chunk/shape stay Python ints.)

    triangular (trans=False only): xORGQR growing window — panel k starts
    at column tile k (exact no-op on eye-structured columns < k; see
    drivers/square.py). Free here: the kernels' column offsets are scalar
    prefetch values and the grids are dynamic, so the SAME executables
    serve the shrinking window."""
    assert not (triangular and trans), "triangular window applies to Q·C only"
    nb, c = f.nb, f.chunk
    m, p = c_mat.shape
    mt = m // nb
    pt = p // nb
    k_max = f.r_diag.shape[0]
    prec = resolve_precision(precision)

    bases, _ = _chunk_bases(mt, f.shape[1] // nb, c)
    base_tab = jnp.asarray(bases, jnp.int32)

    def body(i, cm):
        k = i if trans else (k_max - 1 - i)
        rem = mt - k - 1
        n_head = jnp.minimum((c - (k + 1) % c) % c, rem)
        align = k + 1 + n_head
        nch = (mt - align) // c
        cb = base_tab[k]
        v_stack = jax.lax.dynamic_slice(
            f.v_heads, (k, 0, 0, 0), (1, c, nb, nb))[0]
        t2_stack = jax.lax.dynamic_slice(
            f.t2_heads, (k, 0, 0, 0), (1, c, nb, nb))[0]
        tg_k = jax.lax.dynamic_slice(f.t_geqrt, (k, 0, 0), (1, nb, nb))[0]

        strip = jax.lax.dynamic_slice(cm, (k * nb, 0), (nb, p))
        if trans:
            strip = _larfb_strip_dyn(
                v_stack[0], tg_k, strip, 0, pt, nb, True, prec, interpret
            )
            cm, strip = _couple_strip_dyn(
                v_stack, t2_stack, cm, strip, 1, k + 1, n_head, 0, pt,
                nb, nb, True, False, prec, interpret,
            )
            cm, strip = _couple_strip_dyn(
                f.v_chunks, f.t2_chunks, cm, strip, cb, align // c, nch, 0, pt,
                c * nb, nb, True, False, prec, interpret,
            )
        else:
            # clamp: panels with k >= pt (reduced-ncols orgqr) must yield a
            # provably non-negative dynamic grid — zero-trip grids pass
            # through the aliased buffers, but a NEGATIVE grid size on
            # compiled Mosaic is unspecified behavior
            cs = jnp.minimum(k, pt) if triangular else 0
            ptk = jnp.maximum(pt - cs, 0)
            cm, strip = _couple_strip_dyn(
                f.v_chunks, f.t2_chunks, cm, strip, cb, align // c, nch, cs, ptk,
                c * nb, nb, False, True, prec, interpret,
            )
            cm, strip = _couple_strip_dyn(
                v_stack, t2_stack, cm, strip, 1, k + 1, n_head, cs, ptk,
                nb, nb, False, True, prec, interpret,
            )
            strip = _larfb_strip_dyn(
                v_stack[0], tg_k, strip, cs, ptk, nb, False, prec, interpret
            )
        return jax.lax.dynamic_update_slice(cm, strip, (k * nb, 0))

    return jax.lax.fori_loop(0, k_max, body, c_mat)
