"""Bounded-compile 2D block-cyclic sharded QR (VERDICT r2 next-#1/#4/#5).

The static sharded driver (drivers/sharded.py) trace-unrolls the panel loop
inside the shard_map body with k-varying window shapes — at the acceptance
config (BASELINE.json:11: 32768², nb=256, pr=4 ⇒ k_max=128) that is exactly
the superlinear trace/compile wall the dynamic square driver
(drivers/square_dyn.py) was built to remove. This driver carries the same
technique across the distributed boundary: a ``lax.fori_loop`` over panels
drives a FIXED kernel set whose grid sizes and block offsets are runtime
values (Pallas dynamic grids + scalar-prefetch index maps), so one
executable serves every panel k regardless of panel count.

What is dynamic vs static here:
  * window shapes: every panel uses the FULL local column/row extents; the
    per-panel window is expressed as runtime grid sizes + runtime block
    offsets. Tiles outside the real window are the zero dummy pads, which
    flow through every kernel as tau = 0 no-ops and provably STAY zero
    (V2 = 0 ⇒ SSRFB bottoms unchanged; T2 = 0 ⇒ tops unchanged), so the
    ragged edges neutralize themselves — the static driver's invariant, now
    load-bearing for shape uniformity across k as well as across devices.
  * the TTQRT/TTMQR tree rotation depends on k % pr (the diagonal-owner
    mesh row), and ``ppermute`` permutations must be static — so the tree
    is a ``lax.switch`` over the pr possible rotations, each branch with
    its own static permutation set: O(pr · log pr) collectives compiled
    once, selected per panel at runtime.
  * reflector factors land in flat preallocated per-device buffers (aliased
    pallas outputs at scalar-prefetch slot offsets, as square_dyn's
    DynFactors): GEQRT + unaligned head tiles at slots [k·c, k·c + c),
    chunk couples at a static per-panel base table.

CHUNKED local elimination (VERDICT r2 next-#4): the local sub-diagonal is
eliminated in couples of ``QRConfig.chunk`` tiles exactly as the square
drivers do (kernels/chain.py rationale: the Householder column loop is
latency-bound, so couple count is what matters — measured 1.6× single-chip).
The chunk alignment start differs per device row (the block-cyclic window
offset ls_blk = k//pr + (r < k%pr)), so the head length and chunk count are
runtime values; the local padded row extent is rounded up to a chunk
multiple so chunks always tile the remainder exactly. chunk=1 reproduces the
static sharded driver's per-tile couple order bitwise (pinned by
tests/test_sharded_dyn.py).

Per-panel cross-chip traffic: one full-column masked-psum broadcast along
'cols' (the static driver broadcasts only the window rows; the extra rows
are R rows the panel kernels never read — a simplicity-for-traffic trade
measured harmless at contract scale) plus the log2(pr) R-tile exchanges and
full-width strip pair-exchanges (columns left of the window are stale
sub-diagonal storage, never read again).

Results are DEVICE-NATIVE (VERDICT r2 next-#5): ``assemble_r_sharded_dyn``
and the apply path return jax arrays computed under jit; the block-cyclic →
global unpack runs inside shard_map (two all_gathers + a local transpose),
because the tile interleave is not expressible as a reshape of a
GSPMD-sharded array. No ``device_get`` sits in the driver path.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from tileqr.core.config import QRConfig
from tileqr.core.layout import round_up
from tileqr.drivers.sharded import _from_local_layout, _to_local_layout, _tree_perms
from tileqr.drivers.square_dyn import (
    _couple_strip_dyn,
    _larfb_strip_dyn,
    _panel_chain_dyn,
)
from tileqr.kernels.common import resolve_interpret, resolve_precision, triu
from tileqr.kernels.panel import _mk_panel_kernel
from tileqr.kernels.ssrfb import ssrfb_body
from tileqr.kernels.ttqrt import _ttqrt_call

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


class ShardedDynFactors(NamedTuple):
    """Flat-buffer distributed tiled-QR factors (dynamic sharded driver).

    local: (pr, pc, lm_pad, ln_pad) updated local matrices (sharded; dummy
    tile rows/cols of padding — rows padded to a chunk multiple).
    r_diag: (k_max, nb, nb) final diagonal R tiles (replicated).
    v_heads/t2_heads: (pr, pc, k_max·c, nb, nb) — panel k's packed GEQRT
    tile at slot k·c, unaligned head-couple V2/T2 tiles after it.
    tg_all: (pr, pc, k_max, nb, nb) GEQRT T.
    v_chunks: (pr, pc, total_c, c·nb, nb), t2_chunks (pr, pc, total_c, nb,
    nb): chunk-couple factors at per-panel static bases.
    tree_v2/tree_t2: (pr, pc, k_max, L, nb, nb) TTQRT factors per level."""

    local: jnp.ndarray
    r_diag: jnp.ndarray
    v_heads: jnp.ndarray
    tg_all: jnp.ndarray
    t2_heads: jnp.ndarray
    v_chunks: jnp.ndarray
    t2_chunks: jnp.ndarray
    tree_v2: jnp.ndarray
    tree_t2: jnp.ndarray
    nb: int
    chunk: int
    shape: Tuple[int, int]
    grid: Tuple[int, int, int, int]  # (mt, nt, pr, pc)


jax.tree_util.register_pytree_node(
    ShardedDynFactors,
    lambda f: (tuple(f[:9]), (f.nb, f.chunk, f.shape, f.grid)),
    lambda aux, ch: ShardedDynFactors(*ch, *aux),
)


def _ix(*xs):
    """int32 index tuple (python 0s otherwise promote to i64 under x64)."""
    return tuple(jnp.asarray(x, jnp.int32) for x in xs)


def _row_pad_tiles(lmt: int, c: int) -> int:
    """Local tile-row extent incl. dummies: >= lmt + 2 (the static driver's
    two dummy rows) rounded up so chunks of c tiles always tile the
    remainder exactly for any alignment start."""
    return round_up(lmt + 2, c)


def _chunk_bases_sh(lmt_pad: int, pr: int, c: int, k_max: int):
    """Static chunk-slot offsets: panel k uses at most
    (lmt_pad - (k//pr + 1)) // c chunk couples on any device row."""
    bases, acc = [], 0
    for k in range(k_max):
        bases.append(acc)
        acc += (lmt_pad - (k // pr + 1)) // c
    return bases, max(acc, 1)


def _panel_head_sh(pcol, v_heads, t2_heads, row_off_blk, head_base, n_grid,
                   nb: int, ib: int, interpret: bool):
    """GEQRT + the unaligned head TSQRT couples over the panel-column stack;
    grid (n_grid = 1 + n_head,) dynamic, reading tile rows
    [row_off_blk, row_off_blk + n_grid) of pcol and writing the packed tile
    + head V2/T2 into the flat head buffers at head_base (aliased)."""
    dt = pcol.dtype
    total = v_heads.shape[0]
    inner = _mk_panel_kernel(ib)

    def kernel(s, a_blk, vh_in, t2h_in, r_out, v_out, tg_out, t2_out, at, tt):
        del vh_in, t2h_in
        inner(a_blk, r_out, v_out, tg_out, t2_out, at, tt)

    gs = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_grid,),
        in_specs=[
            pl.BlockSpec((nb, nb), lambda i, s: (s[0] + i, 0)),
            pl.BlockSpec((1, nb, nb), lambda i, s: (s[1] + i, 0, 0)),
            pl.BlockSpec((1, nb, nb), lambda i, s: (s[1] + i, 0, 0)),
        ],
        out_specs=(
            pl.BlockSpec((nb, nb), lambda i, s: (0, 0)),
            pl.BlockSpec((1, nb, nb), lambda i, s: (s[1] + i, 0, 0)),
            pl.BlockSpec((nb, nb), lambda i, s: (0, 0)),
            pl.BlockSpec((1, nb, nb), lambda i, s: (s[1] + i, 0, 0)),
        ),
        scratch_shapes=[
            pltpu.VMEM((nb, 2 * nb), dt),
            pltpu.VMEM((nb, nb), dt),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=gs,
        out_shape=(
            jax.ShapeDtypeStruct((nb, nb), dt),
            jax.ShapeDtypeStruct((total, nb, nb), dt),
            jax.ShapeDtypeStruct((nb, nb), dt),
            jax.ShapeDtypeStruct((total, nb, nb), dt),
        ),
        # operands: scalars(0), pcol(1), v_heads(2), t2_heads(3)
        input_output_aliases={2: 1, 3: 3},
        interpret=interpret,
    )(jnp.stack([row_off_blk, head_base]).astype(jnp.int32),
      pcol, v_heads, t2_heads)


def _mk_tree_factor_branches(pr: int, r, interpret: bool):
    """One branch per diagonal-owner row r_k: the rotated binary TTQRT tree
    with that rotation's STATIC ppermute permutations. Branch: R_local →
    (R_combined-at-root, V2 (L, nb, nb), T2 (L, nb, nb))."""

    def mk(r_k: int):
        levels = _tree_perms(pr, r_k)

        def br(rcur):
            t_rot = (r - r_k) % pr
            vs, ts = [], []
            for down, _up, d in levels:
                recv = jax.lax.ppermute(rcur, "rows", down)
                rnew, v2l, t2l = _ttqrt_call(rcur, recv, interpret)
                root_side = (t_rot % (2 * d) == 0) & (t_rot + d < pr)
                rcur = jnp.where(root_side, triu(rnew), rcur)
                vs.append(v2l)
                ts.append(t2l)
            return rcur, jnp.stack(vs), jnp.stack(ts)

        return br

    return [mk(r_k) for r_k in range(pr)]


def _mk_strip_tree_branches(pr: int, r, trans: bool, prec):
    """Strip-level TTMQR tree (factor/Qᵀ order when trans, reversed Q-apply
    order otherwise), one branch per rotation. Branch: (strip, tree_v2,
    tree_t2) → strip'."""

    def mk(r_k: int):
        levels = list(enumerate(_tree_perms(pr, r_k)))
        if not trans:
            levels = levels[::-1]

        def br(args):
            strip, tv, tt = args
            t_rot = (r - r_k) % pr
            for li, (down, up, d) in levels:
                recv = jax.lax.ppermute(strip, "rows", down)
                new_top, new_bot = ssrfb_body(tv[li], tt[li], strip, recv, trans, prec)
                back = jax.lax.ppermute(new_bot, "rows", up)
                root_side = (t_rot % (2 * d) == 0) & (t_rot + d < pr)
                leaf_side = t_rot % (2 * d) == d
                strip = jnp.where(
                    root_side, new_top, jnp.where(leaf_side, back, strip)
                )
            return strip

        return br

    return [mk(r_k) for r_k in range(pr)]


def _local_geometry(k, r, lmt_pad: int, pr: int, c: int):
    """Per-panel, per-device-row window geometry (all runtime values).

    ls_blk: local tile row of the panel stack top (GEQRT tile); n_head:
    unaligned head couples to reach a c-aligned boundary; cstart: first
    chunk index (units of c tiles); nch: chunk couples to the padded end."""
    r_k = k % pr
    lik = k // pr
    skip_r = (r < r_k).astype(jnp.int32)
    ls_blk = lik + skip_r
    n_head = (c - (ls_blk + 1) % c) % c
    align = ls_blk + 1 + n_head
    nch = (lmt_pad - align) // c
    return ls_blk, n_head, align // c, nch


def qr_sharded_factor_dyn(
    a: jnp.ndarray,
    mesh: Optional[Mesh] = None,
    config: Optional[QRConfig] = None,
) -> ShardedDynFactors:
    """Factor A across a 2D device mesh with O(1) compiled kernels (one
    executable set for any panel count). With chunk=1 the tile algebra and
    couple order match ``qr_sharded_factor`` bitwise; chunk>1 (default)
    eliminates the local sub-diagonal in tall couples (fewer latency-bound
    column loops, kernels/chain.py rationale)."""
    cfg = config if config is not None else QRConfig()
    nb = cfg.nb
    if mesh is None:
        pr, pc = cfg.mesh_shape
        mesh = jax.make_mesh((pr, pc), ("rows", "cols"))
    pr, pc = mesh.devices.shape
    interpret = resolve_interpret(cfg.interpret)
    prec = resolve_precision(cfg.precision)

    a = jnp.asarray(a, cfg.dtype)
    m, n = a.shape
    mp = round_up(m, nb * pr)
    np_ = round_up(n, nb * pc)
    a = jnp.pad(a, ((0, mp - m), (0, np_ - n)))
    mt, nt = mp // nb, np_ // nb
    k_max = min(mt, nt)
    lmt, lnt = mt // pr, nt // pc
    c = max(1, min(cfg.chunk, lmt))

    lmt_pad = _row_pad_tiles(lmt, c)
    local = _to_local_layout(a, nb, pr, pc)
    local = jnp.pad(
        local, ((0, 0), (0, 0), (0, (lmt_pad - lmt) * nb), (0, 2 * nb))
    )
    lm_pad, ln_pad = local.shape[2], local.shape[3]

    cbases, total_c = _chunk_bases_sh(lmt_pad, pr, c, k_max)
    # >=1 level slot even when pr == 1 (no tree): zero-size outputs break
    # shard_map's sharding override; the unused slot stays zero
    n_lvl = max(len(_tree_perms(pr, 0)), 1)

    def body(loc):
        loc = loc[0, 0]
        r = jax.lax.axis_index("rows")
        col = jax.lax.axis_index("cols")
        dt = loc.dtype
        cbase_tab = jnp.asarray(cbases, jnp.int32)

        r_diag = jnp.zeros((k_max, nb, nb), dt)
        v_heads = jnp.zeros((k_max * c, nb, nb), dt)
        tg_all = jnp.zeros((k_max, nb, nb), dt)
        t2_heads = jnp.zeros((k_max * c, nb, nb), dt)
        v_chunks = jnp.zeros((total_c, c * nb, nb), dt)
        t2_chunks = jnp.zeros((total_c, nb, nb), dt)
        tree_v2 = jnp.zeros((k_max, n_lvl, nb, nb), dt)
        tree_t2 = jnp.zeros((k_max, n_lvl, nb, nb), dt)

        tree_branches = _mk_tree_factor_branches(pr, r, interpret)
        strip_branches = _mk_strip_tree_branches(pr, r, True, prec)

        def panel(k, carry):
            k = jnp.asarray(k, jnp.int32)  # x64 mode makes fori indices i64
            (loc, r_diag, v_heads, tg_all, t2_heads, v_chunks, t2_chunks,
             tree_v2, tree_t2) = carry
            r_k, c_k = k % pr, k % pc
            ls_blk, n_head, cstart, nch = _local_geometry(k, r, lmt_pad, pr, c)
            ljs_base = (k + 1) // pc
            skip_c = (col < (k + 1) % pc).astype(jnp.int32)
            ljs_blk = ljs_base + skip_c
            wcols = lnt + 1 - ljs_base
            hb = k * c
            cb = cbase_tab[k]

            # 1. panel-column broadcast along 'cols' (masked psum of the
            # FULL local column; rows above the window are never read)
            pcol_own = jax.lax.dynamic_slice(
                loc, _ix(0, (k // pc) * nb), (lm_pad, nb)
            )
            pcol = jax.lax.psum(pcol_own * (col == c_k).astype(dt), "cols")

            # 2. local chain: GEQRT + unaligned heads, then chunk couples
            r_loc, v_heads, tg_k, t2_heads = _panel_head_sh(
                pcol, v_heads, t2_heads, ls_blk, hb, 1 + n_head, nb,
                cfg.ib, interpret,
            )
            r_c, v_chunks, t2_chunks = _panel_chain_dyn(
                pcol, r_loc, v_chunks, t2_chunks, 0, cstart, nch, cb,
                nb, c, cfg.ib, interpret,
            )
            r_loc = jnp.where(nch > 0, r_c, r_loc)

            # 3. TTQRT tree across mesh rows (rotation selected at runtime)
            if pr > 1:
                rcur, tv, tt = jax.lax.switch(r_k, tree_branches, r_loc)
                tree_v2 = jax.lax.dynamic_update_slice(
                    tree_v2, tv[None], _ix(k, 0, 0, 0)
                )
                tree_t2 = jax.lax.dynamic_update_slice(
                    tree_t2, tt[None], _ix(k, 0, 0, 0)
                )
            else:
                rcur = r_loc
                tv = tt = jnp.zeros((0, nb, nb), dt)

            root_mask = ((r == r_k) & (col == c_k)).astype(dt)
            rk_tile = jax.lax.psum(rcur * root_mask, ("rows", "cols"))
            r_diag = jax.lax.dynamic_update_slice(r_diag, rk_tile[None], _ix(k, 0, 0))
            tg_all = jax.lax.dynamic_update_slice(tg_all, tg_k[None], _ix(k, 0, 0))

            # 4. local trailing update on the full-width row strip + 5. the
            # strip TTMQR tree (full-width: columns left of the window are
            # stale sub-diagonal storage, never read again — see module doc)
            strip = jax.lax.dynamic_slice(
                loc, _ix(ls_blk * nb, 0), (nb, ln_pad)
            )
            vkk = jax.lax.dynamic_slice(v_heads, _ix(hb, 0, 0), (1, nb, nb))[0]
            strip = _larfb_strip_dyn(
                vkk, tg_k, strip, ljs_blk, wcols, nb, True, prec, interpret
            )
            loc, strip = _couple_strip_dyn(
                v_heads, t2_heads, loc, strip, hb + 1, ls_blk + 1, n_head,
                ljs_blk, wcols, nb, nb, True, False, prec, interpret,
            )
            loc, strip = _couple_strip_dyn(
                v_chunks, t2_chunks, loc, strip, cb, cstart, nch,
                ljs_blk, wcols, c * nb, nb, True, False, prec, interpret,
            )
            if pr > 1:
                strip = jax.lax.switch(r_k, strip_branches, (strip, tv, tt))
            loc = jax.lax.dynamic_update_slice(loc, strip, _ix(ls_blk * nb, 0))

            return (loc, r_diag, v_heads, tg_all, t2_heads, v_chunks,
                    t2_chunks, tree_v2, tree_t2)

        carry = (loc, r_diag, v_heads, tg_all, t2_heads, v_chunks, t2_chunks,
                 tree_v2, tree_t2)
        out = jax.lax.fori_loop(0, k_max, panel, carry)
        (loc, r_diag, v_heads, tg_all, t2_heads, v_chunks, t2_chunks,
         tree_v2, tree_t2) = out
        return (loc[None, None], r_diag, v_heads[None, None],
                tg_all[None, None], t2_heads[None, None],
                v_chunks[None, None], t2_chunks[None, None],
                tree_v2[None, None], tree_t2[None, None])

    sh = P("rows", "cols")
    (local_out, r_diag, v_heads, tg_all, t2_heads, v_chunks, t2_chunks,
     tree_v2, tree_t2) = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(sh,),
        out_specs=(sh, P(), sh, sh, sh, sh, sh, sh, sh),
        check_vma=False,
    )(local)

    return ShardedDynFactors(
        local_out, r_diag, v_heads, tg_all, t2_heads, v_chunks, t2_chunks,
        tree_v2, tree_t2, nb, c, (m, n), (mt, nt, pr, pc),
    )


@functools.partial(jax.jit, static_argnames=("nb", "rows", "cols", "mesh"))
def _unpack_local_jit(t, nb: int, rows: int, cols: int, mesh):
    """Device-native block-cyclic → global unpack. The tile interleave is
    not expressible as a reshape of a GSPMD-sharded array (it would split
    and merge sharded axes), so the gather + unpack runs INSIDE shard_map
    where values are plain per-device arrays: two all_gathers replicate the
    (rows × cols tiles) payload, then the unpack is a local transpose.
    t: (pr, pc, lm, ln) sharded; rows/cols: real tile extents (dummy pads
    dropped before the gather)."""

    def body(tb):
        x = tb[0, 0, : rows * nb, : cols * nb]
        xc = jax.lax.all_gather(x, "cols")  # (pc, rows·nb, cols·nb)
        xrc = jax.lax.all_gather(xc, "rows")  # (pr, pc, …)
        return _from_local_layout(xrc, nb)

    return jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(P("rows", "cols"),),
        out_specs=P(),
        check_vma=False,
    )(t)


@functools.partial(jax.jit, static_argnames=("nb", "grid", "shape", "mesh"))
def _assemble_r_dyn_jit(local, r_diag, nb: int, grid, shape, mesh):
    mt, nt, pr, pc = grid
    k_max = min(mt, nt)
    full = _unpack_local_jit(local, nb, mt // pr, nt // pc, mesh)
    r = jnp.triu(full)
    rt = r.reshape(mt, nb, nt, nb)
    idx = jnp.arange(k_max)
    rt = rt.at[idx, :, idx, :].set(jax.vmap(jnp.triu)(r_diag))
    m, n = shape
    return rt.reshape(mt * nb, nt * nb)[:m, :n]


def mesh_from_factors(local, pr: int, pc: int) -> Mesh:
    """The mesh to run a factor-consuming shard_map on when the caller
    passed none: recovered from the factors' OWN sharding when possible
    (ADVICE r4 #4 — rebuilding with jax.make_mesh's default device order
    silently reshards factors produced on a caller mesh with a permuted
    device order: correct values, but a full cross-device transfer at
    contract scale). Falls back to a fresh default mesh for unsharded
    arrays (single-device / interpret runs) or mismatched geometry."""
    sh = getattr(local, "sharding", None)
    m = getattr(sh, "mesh", None)
    # isinstance, not hasattr: AbstractMesh.devices RAISES ValueError
    # (which hasattr propagates — it only swallows AttributeError)
    if isinstance(m, Mesh):
        try:
            if (
                tuple(m.axis_names) == ("rows", "cols")
                and tuple(m.devices.shape) == (pr, pc)
            ):
                return m
        except (AttributeError, TypeError):
            pass
    return jax.make_mesh((pr, pc), ("rows", "cols"))


def assemble_r_sharded_dyn(f: ShardedDynFactors, mesh: Optional[Mesh] = None):
    """R (M, N) as a DEVICE array computed under jit — no host gather in the
    path (VERDICT r2 next-#5)."""
    mt, nt, pr, pc = f.grid
    if mesh is None:
        mesh = mesh_from_factors(f.local, pr, pc)
    return _assemble_r_dyn_jit(f.local, f.r_diag, f.nb, f.grid, f.shape, mesh)


def apply_q_sharded_dyn(
    f: ShardedDynFactors,
    c_mat: jnp.ndarray,
    mesh: Optional[Mesh] = None,
    trans: bool = True,
    config: Optional[QRConfig] = None,
):
    """C ← Qᵀ C (trans) or Q C with the flat distributed factors; returns a
    device array (Mc, P). Replays the factor phases (local chain + row tree)
    through the same O(1) dynamic kernel set."""
    cfg = config if config is not None else QRConfig(nb=f.nb)
    nb, c = f.nb, f.chunk
    mt, nt, pr, pc = f.grid
    if mesh is None:
        mesh = mesh_from_factors(f.local, pr, pc)
    interpret = resolve_interpret(cfg.interpret)
    prec = resolve_precision(cfg.precision)
    k_max = min(mt, nt)
    lmt = mt // pr
    lmt_pad = _row_pad_tiles(lmt, c)

    c_mat = jnp.asarray(c_mat, f.local.dtype)
    mc, p = c_mat.shape
    mpad = mt * nb
    ppad = round_up(max(p, 1), nb * pc)
    cp = jnp.pad(c_mat, ((0, mpad - mc), (0, ppad - p)))
    cl = _to_local_layout(cp, nb, pr, pc)
    cl = jnp.pad(cl, ((0, 0), (0, 0), (0, (lmt_pad - lmt) * nb), (0, 0)))
    lp = cl.shape[3]
    lpt = lp // nb

    cbases, _total = _chunk_bases_sh(lmt_pad, pr, c, k_max)

    def body(cloc, v_heads, tg_all, t2_heads, v_chunks, t2_chunks,
             tree_v2, tree_t2):
        cloc = cloc[0, 0]
        v_heads, tg_all, t2_heads = v_heads[0, 0], tg_all[0, 0], t2_heads[0, 0]
        v_chunks, t2_chunks = v_chunks[0, 0], t2_chunks[0, 0]
        tree_v2, tree_t2 = tree_v2[0, 0], tree_t2[0, 0]
        r = jax.lax.axis_index("rows")
        cbase_tab = jnp.asarray(cbases, jnp.int32)
        strip_branches = _mk_strip_tree_branches(pr, r, trans, prec)

        def one_panel(i, cm):
            i = jnp.asarray(i, jnp.int32)  # x64 mode makes fori indices i64
            k = i if trans else (k_max - 1 - i)
            r_k = k % pr
            ls_blk, n_head, cstart, nch = _local_geometry(k, r, lmt_pad, pr, c)
            hb = k * c
            cb = cbase_tab[k]
            vkk = jax.lax.dynamic_slice(v_heads, _ix(hb, 0, 0), (1, nb, nb))[0]
            tg_k = jax.lax.dynamic_slice(tg_all, _ix(k, 0, 0), (1, nb, nb))[0]
            tv = jax.lax.dynamic_slice(
                tree_v2, _ix(k, 0, 0, 0), (1,) + tree_v2.shape[1:]
            )[0]
            tt = jax.lax.dynamic_slice(
                tree_t2, _ix(k, 0, 0, 0), (1,) + tree_t2.shape[1:]
            )[0]

            strip = jax.lax.dynamic_slice(cm, _ix(ls_blk * nb, 0), (nb, lp))
            if trans:
                strip = _larfb_strip_dyn(
                    vkk, tg_k, strip, 0, lpt, nb, True, prec, interpret
                )
                cm, strip = _couple_strip_dyn(
                    v_heads, t2_heads, cm, strip, hb + 1, ls_blk + 1, n_head,
                    0, lpt, nb, nb, True, False, prec, interpret,
                )
                cm, strip = _couple_strip_dyn(
                    v_chunks, t2_chunks, cm, strip, cb, cstart, nch,
                    0, lpt, c * nb, nb, True, False, prec, interpret,
                )
                if pr > 1:
                    strip = jax.lax.switch(r_k, strip_branches, (strip, tv, tt))
            else:
                if pr > 1:
                    strip = jax.lax.switch(r_k, strip_branches, (strip, tv, tt))
                cm, strip = _couple_strip_dyn(
                    v_chunks, t2_chunks, cm, strip, cb, cstart, nch,
                    0, lpt, c * nb, nb, False, True, prec, interpret,
                )
                cm, strip = _couple_strip_dyn(
                    v_heads, t2_heads, cm, strip, hb + 1, ls_blk + 1, n_head,
                    0, lpt, nb, nb, False, True, prec, interpret,
                )
                strip = _larfb_strip_dyn(
                    vkk, tg_k, strip, 0, lpt, nb, False, prec, interpret
                )
            return jax.lax.dynamic_update_slice(cm, strip, _ix(ls_blk * nb, 0))

        return jax.lax.fori_loop(0, k_max, one_panel, cloc)[None, None]

    sh = P("rows", "cols")
    cl_out = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(sh,) * 8,
        out_specs=sh,
        check_vma=False,
    )(cl, f.v_heads, f.tg_all, f.t2_heads, f.v_chunks, f.t2_chunks,
      f.tree_v2, f.tree_t2)

    out = _unpack_local_jit(cl_out, nb, lmt, lpt, mesh)
    return out[:mc, :p]
