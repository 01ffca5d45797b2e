"""Bounded-compile 2D block-cyclic sharded QR (VERDICT r2 next-#1).

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
    per-panel window is expressed as a runtime grid size (rows: lmt+1-lik,
    cols: lnt+1-(k+1)//pc) + runtime block offsets. Tiles outside the real
    window are the zero dummy pads, which flow through every kernel as
    tau = 0 no-ops and provably STAY zero (V2 = 0 ⇒ SSRFB bottoms
    unchanged; T2 = 0 ⇒ tops unchanged), so the ragged edges neutralize
    themselves — same invariant as the static driver, now load-bearing for
    shape uniformity across k as well as across devices.
  * the TTQRT/TTMQR tree rotation depends on k % pr (the diagonal-owner
    mesh row), and ``ppermute`` permutations must be static — so the tree
    is a ``lax.switch`` over the pr possible rotations, each branch with
    its own static permutation set: O(pr · log pr) collectives compiled
    once, selected per panel at runtime.
  * reflector factors land in flat preallocated per-device buffers (aliased
    pallas outputs at scalar-prefetch slot offsets, as DynFactors): slot
    base per panel from a static table, nrows(k) = lmt + 1 - k//pr slots.

Per-panel algebra is IDENTICAL to the static sharded driver (same kernels,
same couple order, same tree), so results agree bitwise — pinned by
tests/test_sharded_dyn.py. Cross-chip traffic per panel: one full-column
masked-psum broadcast along 'cols' (the static driver broadcasts only the
window rows; the extra rows are R rows the panel kernels never read — a
simplicity-for-traffic trade measured harmless at contract scale) plus the
log2(pr) R-tile exchanges and full-width strip pair-exchanges.

Results are DEVICE-NATIVE (VERDICT r2 next-#5): ``assemble_r`` and the
apply path return jax arrays computed under jit (the block-cyclic unpack is
a pure-jnp reshape/transpose XLA reshards on its own); no ``device_get``
sits in the driver path.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from jax.sharding import Mesh, PartitionSpec as P

from tileqr.core.config import QRConfig
from tileqr.core.layout import round_up
from tileqr.drivers.sharded import _from_local_layout, _to_local_layout, _tree_perms
from tileqr.drivers.square_dyn import _couple_strip_dyn, _larfb_strip_dyn
from tileqr.kernels.common import resolve_interpret, resolve_precision, triu
from tileqr.kernels.panel import _mk_panel_kernel
from tileqr.kernels.ssrfb import ssrfb_body
from tileqr.kernels.ttqrt import _ttqrt_call


class ShardedDynFactors(NamedTuple):
    """Flat-buffer distributed tiled-QR factors (dynamic sharded driver).

    local: (pr, pc, lm_pad, ln_pad) updated local matrices (sharded; 2 dummy
    tile rows/cols of padding). r_diag: (k_max, nb, nb) final diagonal R
    tiles (replicated). v_flat/t2_flat: (pr, pc, total_slots, nb, nb) —
    panel k's local chain factors at slots [base(k), base(k)+nrows(k));
    slot base(k) holds the packed GEQRT tile on the diagonal-owner row.
    tg_all: (pr, pc, k_max, nb, nb) GEQRT T. tree_v2/tree_t2:
    (pr, pc, k_max, L, nb, nb) TTQRT factors per tree level (L = 0 ⇒ pr = 1
    and the arrays are empty)."""

    local: jnp.ndarray
    r_diag: jnp.ndarray
    v_flat: jnp.ndarray
    tg_all: jnp.ndarray
    t2_flat: jnp.ndarray
    tree_v2: jnp.ndarray
    tree_t2: jnp.ndarray
    nb: int
    shape: Tuple[int, int]
    grid: Tuple[int, int, int, int]  # (mt, nt, pr, pc)


jax.tree_util.register_pytree_node(
    ShardedDynFactors,
    lambda f: (tuple(f[:7]), (f.nb, f.shape, f.grid)),
    lambda aux, ch: ShardedDynFactors(*ch, *aux),
)


def _ix(*xs):
    """int32 index tuple (python 0s otherwise promote to i64 under x64)."""
    return tuple(jnp.asarray(x, jnp.int32) for x in xs)


def _slot_bases(lmt: int, pr: int, k_max: int):
    """Static flat-buffer slot offsets: panel k owns nrows(k) = lmt+1-k//pr
    slots (its maximal window: all remaining local tile rows + >=1 dummy)."""
    bases, acc = [], 0
    for k in range(k_max):
        bases.append(acc)
        acc += lmt + 1 - k // pr
    return bases, max(acc, 1)


def _panel_factor_sh(pcol, v_flat, t2_flat, row_off_blk, slot_base, nrows,
                     nb: int, ib: int, interpret: bool):
    """Local GEQRT + TSQRT chain over the panel-column stack; grid (nrows,)
    dynamic, reading tile rows [row_off_blk, row_off_blk+nrows) of pcol and
    writing V/T2 in place into the flat buffers at slot_base (aliased)."""
    dt = pcol.dtype
    total = v_flat.shape[0]
    inner = _mk_panel_kernel(ib)

    def kernel(s, a_blk, vf_in, t2f_in, r_out, v_out, tg_out, t2_out, at, tt):
        del vf_in, t2f_in
        inner(a_blk, r_out, v_out, tg_out, t2_out, at, tt)

    gs = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nrows,),
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
        # operands: scalars(0), pcol(1), v_flat(2), t2_flat(3)
        input_output_aliases={2: 1, 3: 3},
        interpret=interpret,
    )(jnp.stack([row_off_blk, slot_base]).astype(jnp.int32),
      pcol, v_flat, t2_flat)


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


def qr_sharded_factor_dyn(
    a: jnp.ndarray,
    mesh: Optional[Mesh] = None,
    config: Optional[QRConfig] = None,
) -> ShardedDynFactors:
    """Factor A across a 2D device mesh with O(1) compiled kernels (one
    executable set for any panel count). Same tile algebra and numerics as
    ``qr_sharded_factor`` — results agree bitwise."""
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

    local = _to_local_layout(a, nb, pr, pc)
    local = jnp.pad(local, ((0, 0), (0, 0), (0, 2 * nb), (0, 2 * nb)))
    lm_pad, ln_pad = local.shape[2], local.shape[3]

    bases, total_slots = _slot_bases(lmt, pr, k_max)
    # >=1 level slot even when pr == 1 (no tree): zero-size outputs break
    # shard_map's sharding override; the unused slot stays zero
    n_lvl = max(len(_tree_perms(pr, 0)), 1)

    def body(loc):
        loc = loc[0, 0]
        r = jax.lax.axis_index("rows")
        c = jax.lax.axis_index("cols")
        dt = loc.dtype
        base_tab = jnp.asarray(bases, jnp.int32)

        r_diag = jnp.zeros((k_max, nb, nb), dt)
        v_flat = jnp.zeros((total_slots, nb, nb), dt)
        tg_all = jnp.zeros((k_max, nb, nb), dt)
        t2_flat = jnp.zeros((total_slots, nb, nb), dt)
        tree_v2 = jnp.zeros((k_max, n_lvl, nb, nb), dt)
        tree_t2 = jnp.zeros((k_max, n_lvl, nb, nb), dt)

        tree_branches = _mk_tree_factor_branches(pr, r, interpret)
        strip_branches = _mk_strip_tree_branches(pr, r, True, prec)

        def panel(k, carry):
            k = jnp.asarray(k, jnp.int32)  # x64 mode makes fori indices i64
            loc, r_diag, v_flat, tg_all, t2_flat, tree_v2, tree_t2 = carry
            r_k, c_k = k % pr, k % pc
            lik = k // pr
            nrows = lmt + 1 - lik
            skip_r = (r < r_k).astype(jnp.int32)
            ls_blk = lik + skip_r
            ljs_base = (k + 1) // pc
            skip_c = (c < (k + 1) % pc).astype(jnp.int32)
            ljs_blk = ljs_base + skip_c
            wcols = lnt + 1 - ljs_base
            vb = base_tab[k]

            # 1. panel-column broadcast along 'cols' (masked psum of the
            # FULL local column; rows above the window are never read)
            pcol_own = jax.lax.dynamic_slice(
                loc, _ix(0, (k // pc) * nb), (lm_pad, nb)
            )
            pcol = jax.lax.psum(pcol_own * (c == c_k).astype(dt), "cols")

            # 2. local chain into the flat factor buffers
            r_loc, v_flat, tg_k, t2_flat = _panel_factor_sh(
                pcol, v_flat, t2_flat, ls_blk, vb, nrows, nb, cfg.ib, interpret
            )

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

            root_mask = ((r == r_k) & (c == c_k)).astype(dt)
            rk_tile = jax.lax.psum(rcur * root_mask, ("rows", "cols"))
            r_diag = jax.lax.dynamic_update_slice(r_diag, rk_tile[None], _ix(k, 0, 0))
            tg_all = jax.lax.dynamic_update_slice(tg_all, tg_k[None], _ix(k, 0, 0))

            # 4. local trailing update on the full-width row strip + 5. the
            # strip TTMQR tree (full-width: columns left of the window are
            # stale sub-diagonal storage, never read again — see module doc)
            strip = jax.lax.dynamic_slice(
                loc, _ix(ls_blk * nb, 0), (nb, ln_pad)
            )
            vkk = jax.lax.dynamic_slice(v_flat, _ix(vb, 0, 0), (1, nb, nb))[0]
            strip = _larfb_strip_dyn(
                vkk, tg_k, strip, ljs_blk, wcols, nb, True, prec, interpret
            )
            loc, strip = _couple_strip_dyn(
                v_flat, t2_flat, loc, strip, vb + 1, ls_blk + 1, nrows - 1,
                ljs_blk, wcols, nb, nb, True, False, prec, interpret,
            )
            if pr > 1:
                strip = jax.lax.switch(r_k, strip_branches, (strip, tv, tt))
            loc = jax.lax.dynamic_update_slice(loc, strip, _ix(ls_blk * nb, 0))

            return loc, r_diag, v_flat, tg_all, t2_flat, tree_v2, tree_t2

        carry = (loc, r_diag, v_flat, tg_all, t2_flat, tree_v2, tree_t2)
        loc, r_diag, v_flat, tg_all, t2_flat, tree_v2, tree_t2 = (
            jax.lax.fori_loop(0, k_max, panel, carry)
        )
        return (loc[None, None], r_diag, v_flat[None, None], tg_all[None, None],
                t2_flat[None, None], tree_v2[None, None], tree_t2[None, None])

    sh = P("rows", "cols")
    local_out, r_diag, v_flat, tg_all, t2_flat, tree_v2, tree_t2 = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(sh,),
        out_specs=(sh, P(), sh, sh, sh, sh, sh),
        check_vma=False,
    )(local)

    return ShardedDynFactors(
        local_out, r_diag, v_flat, tg_all, t2_flat, tree_v2, tree_t2,
        nb, (m, n), (mt, nt, pr, pc),
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


def assemble_r_sharded_dyn(f: ShardedDynFactors, mesh: Optional[Mesh] = None):
    """R (M, N) as a DEVICE array computed under jit — no host gather in the
    path (VERDICT r2 next-#5)."""
    mt, nt, pr, pc = f.grid
    if mesh is None:
        mesh = jax.make_mesh((pr, pc), ("rows", "cols"))
    return _assemble_r_dyn_jit(f.local, f.r_diag, f.nb, f.grid, f.shape, mesh)


def apply_q_sharded_dyn(
    f: ShardedDynFactors,
    c: jnp.ndarray,
    mesh: Optional[Mesh] = None,
    trans: bool = True,
    config: Optional[QRConfig] = None,
):
    """C ← Qᵀ C (trans) or Q C with the flat distributed factors; returns a
    device array (Mc, P). Replays the factor phases (local chain + row tree)
    through the same O(1) dynamic kernel set."""
    cfg = config if config is not None else QRConfig(nb=f.nb)
    nb = f.nb
    mt, nt, pr, pc = f.grid
    if mesh is None:
        mesh = jax.make_mesh((pr, pc), ("rows", "cols"))
    interpret = resolve_interpret(cfg.interpret)
    prec = resolve_precision(cfg.precision)
    k_max = min(mt, nt)
    lmt = mt // pr

    c = jnp.asarray(c, f.local.dtype)
    mc, p = c.shape
    mpad = mt * nb
    ppad = round_up(max(p, 1), nb * pc)
    cp = jnp.pad(c, ((0, mpad - mc), (0, ppad - p)))
    cl = _to_local_layout(cp, nb, pr, pc)
    cl = jnp.pad(cl, ((0, 0), (0, 0), (0, 2 * nb), (0, 0)))
    lp = cl.shape[3]
    lpt = lp // nb

    bases, _total = _slot_bases(lmt, pr, k_max)

    def body(cloc, v_flat, tg_all, t2_flat, tree_v2, tree_t2):
        cloc = cloc[0, 0]
        v_flat, tg_all, t2_flat = v_flat[0, 0], tg_all[0, 0], t2_flat[0, 0]
        tree_v2, tree_t2 = tree_v2[0, 0], tree_t2[0, 0]
        r = jax.lax.axis_index("rows")
        base_tab = jnp.asarray(bases, jnp.int32)
        strip_branches = _mk_strip_tree_branches(pr, r, trans, prec)

        def one_panel(i, cm):
            i = jnp.asarray(i, jnp.int32)  # x64 mode makes fori indices i64
            k = i if trans else (k_max - 1 - i)
            r_k = k % pr
            lik = k // pr
            nrows = lmt + 1 - lik
            skip_r = (r < r_k).astype(jnp.int32)
            ls_blk = lik + skip_r
            vb = base_tab[k]
            vkk = jax.lax.dynamic_slice(v_flat, _ix(vb, 0, 0), (1, nb, nb))[0]
            tg_k = jax.lax.dynamic_slice(tg_all, _ix(k, 0, 0), (1, nb, nb))[0]
            tv = jax.lax.dynamic_slice(
                tree_v2, _ix(k, 0, 0, 0), (1,) + tree_v2.shape[1:]
            )[0]
            tt = jax.lax.dynamic_slice(
                tree_t2, _ix(k, 0, 0, 0), (1,) + tree_t2.shape[1:]
            )[0]

            strip = jax.lax.dynamic_slice(
                cm, _ix(ls_blk * nb, 0), (nb, lp)
            )
            if trans:
                strip = _larfb_strip_dyn(
                    vkk, tg_k, strip, 0, lpt, nb, True, prec, interpret
                )
                cm, strip = _couple_strip_dyn(
                    v_flat, t2_flat, cm, strip, vb + 1, ls_blk + 1, nrows - 1,
                    0, lpt, nb, nb, True, False, prec, interpret,
                )
                if pr > 1:
                    strip = jax.lax.switch(r_k, strip_branches, (strip, tv, tt))
            else:
                if pr > 1:
                    strip = jax.lax.switch(r_k, strip_branches, (strip, tv, tt))
                cm, strip = _couple_strip_dyn(
                    v_flat, t2_flat, cm, strip, vb + 1, ls_blk + 1, nrows - 1,
                    0, lpt, nb, nb, False, True, prec, interpret,
                )
                strip = _larfb_strip_dyn(
                    vkk, tg_k, strip, 0, lpt, nb, False, prec, interpret
                )
            return jax.lax.dynamic_update_slice(
                cm, strip, _ix(ls_blk * nb, 0)
            )

        return jax.lax.fori_loop(0, k_max, one_panel, cloc)[None, None]

    sh = P("rows", "cols")
    cl_out = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(sh, sh, sh, sh, sh, sh),
        out_specs=sh,
        check_vma=False,
    )(cl, f.v_flat, f.tg_all, f.t2_flat, f.tree_v2, f.tree_t2)

    out = _unpack_local_jit(cl_out, nb, lmt, lpt, mesh)
    return out[:mc, :p]
