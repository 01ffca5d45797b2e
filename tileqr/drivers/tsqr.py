"""Tall-skinny TSQR driver (reference component C8, SURVEY.md §3.2;
BASELINE.json:9 config — 1048576×512).

The reference splits an M×nb panel into row-block leaves, GEQRTs every leaf,
then runs TTQRT tree levels to one R — the communication-avoiding CAQR
reduction [BASELINE.json:5, PAPERS.md Demmel CAQR]. The TPU bottleneck is the
serial Householder column loop: every leaf and every combine pays one n-column
loop, so wall-clock ∝ (#leaves + #combines) × n, NOT flops. The r1 binary
tree with nb-row leaves paid (M/nb − 1 + M/nb) loops and ran 7.8× slower than
the chain strategy; this driver minimizes loop count instead:

  * TALL leaves: one Pallas grid program factors ``leaf_rows`` (default up to
    4096) rows per column loop. Leaves bigger than the ~16 MB VMEM scope are
    staged manually — the input lives in HBM (memory_space=ANY) and the
    kernel DMAs stage_rows-row chunks through a small VMEM buffer into the
    transposed working scratch (and back out for the packed reflectors), so
    only the (n, leaf_rows) scratch + one stage buffer are resident.
  * WIDE-arity tree: each level stacks up to ``arity`` surviving R factors
    and re-runs the SAME tall kernel on the (a·n, n) stacks — one column loop
    eliminates a−1 R's (the r1 binary TTQRT eliminated one). The TT structure
    (upper-triangular blocks) is preserved exactly by the masked column math;
    the ~2× triangular flop saving is NOT shape-exploited because the cost is
    column-loop latency, not flops (measured: block-boundary overheads and
    serial latency dominate ≥10:1 over MXU time at these shapes).

Tree shape (grouping, arity per level, survivor order) is a static function
of (M, n, leaf_rows, arity) — fixed shapes, deterministic outputs
[BASELINE.json:5 "bitwise-stable"].

Apply-Qᵀ replays leaves then levels on the group-stacked top slices of the
target; all compact-WY matmuls (larfb_body) — pure MXU XLA, no kernel needed.
"""

from __future__ import annotations

import functools
from typing import List, NamedTuple, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tileqr.kernels.common import acc_type, resolve_interpret, resolve_precision, triu
from tileqr.kernels.geqrt import geqrt_in_refs
from tileqr.kernels.larfb import larfb_body


class TSQRFactors(NamedTuple):
    """packed_leaves: (M, n) leaf reflectors (packed GEQRT form per leaf);
    t_leaves: (p, n, n) leaf compact-WY T factors; levels: per tree level
    (packed (ncomb, a·n, n), t (ncomb, n, n), survivors_before, arity);
    r: (n, n) final factor.

    Registered as a jax pytree whose int fields (leaf_rows, shape, plan,
    level counts) are STATIC aux data, so factors pass through ``jax.jit``
    boundaries as arguments — closing over a factor instead bakes its
    arrays into the HLO as multi-GiB constants (measured 3.6 GB at the
    1048576×512 config, which breaks remote compilation)."""

    packed_leaves: jnp.ndarray
    t_leaves: jnp.ndarray
    levels: Tuple
    r: jnp.ndarray
    leaf_rows: int
    shape: Tuple[int, int]
    plan: Tuple  # static _tree_plan output, parallel to ``levels``


def _tsqr_factors_flatten(f: TSQRFactors):
    lvl_arrays = tuple((pk, tl) for pk, tl, _, _ in f.levels)
    lvl_static = tuple((cnt, a) for _, _, cnt, a in f.levels)
    return (
        (f.packed_leaves, f.t_leaves, lvl_arrays, f.r),
        (lvl_static, f.leaf_rows, f.shape, f.plan),
    )


def _tsqr_factors_unflatten(aux, children):
    lvl_static, leaf_rows, shape, plan = aux
    packed, ts, lvl_arrays, r = children
    levels = tuple(
        (pk, tl, cnt, a) for (pk, tl), (cnt, a) in zip(lvl_arrays, lvl_static)
    )
    return TSQRFactors(packed, ts, levels, r, leaf_rows, shape, plan)


jax.tree_util.register_pytree_node(
    TSQRFactors, _tsqr_factors_flatten, _tsqr_factors_unflatten
)


# VMEM budget for the transposed working scratch. The kernel's peak footprint
# is ~3× this (scratch + stage + the (n−ib, leaf_rows) value the MXU
# block-apply loads from the scratch ref + T out) and must stay under the
# 16 MB scoped-vmem limit — 8 MB scratch was measured to OOM at 22.35 MB.
_SCRATCH_BYTES = 4 * 1024 * 1024
# unstaged (BlockSpec-streamed) kernels double-buffer in+out: keep leaves
# small enough that ~6 copies of the leaf block + scratch fit
_UNSTAGED_LEAF_BYTES = 1 * 1024 * 1024


def auto_leaf_rows(m: int, n: int) -> int:
    """Largest leaf that keeps the (n, leaf_rows) scratch within budget.

    Floored at 2n so the tree precondition (leaf >= two stacked R factors)
    holds for any n — for n > ~1024 the resulting scratch exceeds the 16 MB
    Mosaic VMEM scope and the tree only runs in interpret mode (on compiled
    TPU, strategy "auto" routes such shapes through the chain). 128-aligned
    when possible so the staged kernel's lane slices stay register-tiled."""
    target = max(2 * n, _SCRATCH_BYTES // (n * 4))
    target -= target % 128 if target >= 128 else target % 8
    target = max(target, 2 * n)
    if target % 8:
        target += 8 - target % 8
    return max(8, min(m, target))


def _mk_tall_kernel(ib: int, n: int, leaf_rows: int, stage_rows: int, staged: bool):
    if not staged:

        def kernel(a_ref, packed_ref, t_ref, at_scr, tt_scr):
            at_scr[:] = a_ref[:].T
            tt_scr[:] = jnp.zeros_like(tt_scr)
            geqrt_in_refs(at_scr, tt_scr, n, ib=ib)
            packed_ref[:] = at_scr[:].T
            t_ref[0] = tt_scr[:].T

        return kernel

    nchunks = leaf_rows // stage_rows

    def kernel(a_any, packed_any, t_ref, at_scr, tt_scr, stage, sem):
        i = pl.program_id(0)
        for h in range(nchunks):
            cp = pltpu.make_async_copy(
                a_any.at[pl.ds(i * leaf_rows + h * stage_rows, stage_rows), :],
                stage,
                sem,
            )
            cp.start()
            cp.wait()
            at_scr[:, h * stage_rows : (h + 1) * stage_rows] = stage[:].T
        tt_scr[:] = jnp.zeros_like(tt_scr)
        geqrt_in_refs(at_scr, tt_scr, n, ib=ib)
        for h in range(nchunks):
            stage[:] = at_scr[:, h * stage_rows : (h + 1) * stage_rows].T
            cp = pltpu.make_async_copy(
                stage,
                packed_any.at[pl.ds(i * leaf_rows + h * stage_rows, stage_rows), :],
                sem,
            )
            cp.start()
            cp.wait()
        t_ref[0] = tt_scr[:].T

    return kernel


@functools.partial(jax.jit, static_argnames=("leaf_rows", "ib", "interpret"))
def tall_geqrt(a, leaf_rows: int, ib: int = 128, interpret: bool = False):
    """Factor every ``leaf_rows``-row block of a (M, n), M % leaf_rows == 0:
    one Householder column loop per block. Returns (packed (M, n), T (p, n, n))."""
    m, n = a.shape
    p = m // leaf_rows
    dt = a.dtype
    staged = leaf_rows * n * 4 > _UNSTAGED_LEAF_BYTES
    if staged and leaf_rows % 8:
        # only the staged path slices the leaf for DMA; unstaged (small)
        # leaves — e.g. tree-level combine stacks with n % 8 != 0 — are fine
        raise ValueError(f"staged leaf_rows={leaf_rows} must be a multiple of 8")
    if not interpret:
        # compiled Mosaic: the transposed working scratch must fit the
        # ~16 MB VMEM scope — fail with guidance instead of an obscure
        # Mosaic OOM (large-n trees run in interpret mode or via the chain
        # strategy; see auto_leaf_rows)
        scratch_bytes = (n * leaf_rows + n * n) * 4
        if scratch_bytes > 14 * 1024 * 1024:
            raise ValueError(
                f"tall_geqrt scratch (n={n}, leaf_rows={leaf_rows}) needs "
                f"{scratch_bytes / 2**20:.1f} MB VMEM > the ~16 MB Mosaic "
                "scope; use a smaller leaf/n, interpret mode, or the chain "
                "strategy (tsqr(strategy='chain'))"
            )
    # stage buffer: a divisor of leaf_rows, preferring quarter/half leaves
    # that keep lane slice offsets (h·stage_rows) 128-aligned; fall back to
    # the whole leaf (single DMA) rather than risk unaligned slices or a
    # non-terminating search for awkward leaf_rows
    stage_rows = leaf_rows
    if staged:
        for cand in (leaf_rows // 4, leaf_rows // 2):
            if cand >= 8 and leaf_rows % cand == 0 and cand % 128 == 0:
                stage_rows = cand
                break
        else:
            for cand in (leaf_rows // 4, leaf_rows // 2):
                if cand >= 8 and leaf_rows % cand == 0 and cand % 8 == 0:
                    stage_rows = cand
                    break

    kernel = _mk_tall_kernel(ib, n, leaf_rows, stage_rows, staged)
    scratch = [
        pltpu.VMEM((n, leaf_rows), dt),
        pltpu.VMEM((n, n), dt),
    ]
    if staged:
        in_specs = [pl.BlockSpec(memory_space=pl.ANY)]
        packed_spec = pl.BlockSpec(memory_space=pl.ANY)
        scratch += [pltpu.VMEM((stage_rows, n), dt), pltpu.SemaphoreType.DMA]
    else:
        in_specs = [
            pl.BlockSpec((leaf_rows, n), lambda i: (i, 0), memory_space=pltpu.VMEM)
        ]
        packed_spec = pl.BlockSpec(
            (leaf_rows, n), lambda i: (i, 0), memory_space=pltpu.VMEM
        )
    return pl.pallas_call(
        kernel,
        grid=(p,),
        in_specs=in_specs,
        out_shape=(
            jax.ShapeDtypeStruct((m, n), dt),
            jax.ShapeDtypeStruct((p, n, n), dt),
        ),
        out_specs=(
            packed_spec,
            pl.BlockSpec((1, n, n), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ),
        scratch_shapes=scratch,
        interpret=interpret,
    )(a)


def _tree_plan(p: int, n: int, leaf_rows: int, arity: int):
    """Static tree: per level (groups, a_l, flat_idx, rem_idx) over ORIGINAL
    leaf indices; survivors stay ascending (group reps then remainder)."""
    a_cap = max(2, min(arity, leaf_rows // n))
    levels = []
    idx = list(range(p))
    while len(idx) > 1:
        a_l = min(a_cap, len(idx))
        ncomb = len(idx) // a_l
        flat = idx[: ncomb * a_l]
        rem = idx[ncomb * a_l :]
        reps = flat[::a_l]
        levels.append((ncomb, a_l, tuple(flat), tuple(rem)))
        idx = sorted(reps + rem)
    return levels


def tsqr_factor(
    a: jnp.ndarray,
    nb: int,
    ib: int = 128,
    interpret: bool | None = None,
    leaf_rows: int | None = None,
    arity: int = 8,
) -> TSQRFactors:
    """TSQR-factor a tall-skinny A (M, n) with n <= nb, M % leaf_rows == 0
    (leaf_rows defaults to the largest VMEM-budget leaf; api.tsqr pads M)."""
    m, n = a.shape
    if n > nb:
        raise ValueError(f"tsqr requires n={n} <= nb={nb}")
    interp = resolve_interpret(interpret)
    lr = leaf_rows if leaf_rows is not None else auto_leaf_rows(m, n)
    if m % lr:
        raise ValueError(f"M={m} not a multiple of leaf_rows={lr}")
    p = m // lr
    if p > 1 and lr < 2 * n:
        raise ValueError(f"tree needs leaf_rows={lr} >= 2n={2*n}")
    ib_eff = min(ib, n)
    packed, ts = tall_geqrt(a, lr, ib=ib_eff, interpret=interp)
    rs = jax.vmap(triu)(packed.reshape(p, lr, n)[:, :n, :])

    plan = _tree_plan(p, n, lr, arity)
    levels: List = []
    for ncomb, a_l, flat, rem in plan:
        # factor-order invariant: rs rows follow the current survivor list
        stack = rs[: ncomb * a_l].reshape(ncomb * a_l * n, n)
        pk, tl = tall_geqrt(stack, a_l * n, ib=ib_eff, interpret=interp)
        pk = pk.reshape(ncomb, a_l * n, n)
        rnew = jax.vmap(triu)(pk[:, :n, :])
        rs = (
            jnp.concatenate([rnew, rs[ncomb * a_l :]], axis=0)
            if rem
            else rnew
        )
        levels.append((pk, tl, ncomb * a_l + len(rem), a_l))
    return TSQRFactors(packed, ts, tuple(levels), rs[0], lr, (m, n), tuple(plan))


def tsqr_apply_q(
    f: TSQRFactors,
    c: jnp.ndarray,
    trans: bool = True,
    precision: str = "highest",
    interpret: bool | None = None,
):
    """C ← Qᵀ C (trans) or Q C for the TSQR Q.

    c: (Mc, P) with Mc <= f.shape[0] — ``api.tsqr(mode="factor")`` pads M up
    to a multiple of the auto-selected ``f.leaf_rows`` (up to 4096 rows, a
    much larger granule than nb), so external callers pass c in the ORIGINAL
    row count and the padding/slicing happens here: the pad rows correspond
    to zero rows of the factored input, whose reflector rows are exactly
    zero, so Qᵀ/Q act as the identity on them.
    """
    del interpret  # replay is pure XLA matmuls
    prec = resolve_precision(precision)
    m, n = f.shape
    lr = f.leaf_rows
    p = m // lr
    mc, pcols = c.shape
    if mc > m:
        raise ValueError(f"c rows {mc} > factored M {m}")
    c = jnp.pad(c, ((0, m - mc), (0, 0)))
    plan = f.plan

    cb = c.reshape(p, lr, pcols)

    def leaf_apply(packed, t, cblk):
        return larfb_body(packed, t, cblk, trans, prec)

    def level_apply(tops, level, packed_lvl, t_lvl, tr):
        ncomb, a_l, flat, rem = level
        gather = jnp.asarray(flat)
        stack = tops[gather].reshape(ncomb, a_l * n, pcols)
        new = jax.vmap(lambda pk, tm, st: larfb_body(pk, tm, st, tr, prec))(
            packed_lvl, t_lvl, stack
        )
        return tops.at[gather].set(new.reshape(ncomb * a_l, n, pcols))

    if trans:
        cb = jax.vmap(leaf_apply)(f.packed_leaves.reshape(p, lr, n), f.t_leaves, cb)
        tops = cb[:, :n, :]
        for level, (pk, tl, _cnt, _a) in zip(plan, f.levels):
            tops = level_apply(tops, level, pk, tl, True)
        cb = cb.at[:, :n, :].set(tops)
    else:
        tops = cb[:, :n, :]
        for level, (pk, tl, _cnt, _a) in zip(plan[::-1], f.levels[::-1]):
            tops = level_apply(tops, level, pk, tl, False)
        cb = cb.at[:, :n, :].set(tops)
        cb = jax.vmap(leaf_apply)(f.packed_leaves.reshape(p, lr, n), f.t_leaves, cb)
    return cb.reshape(m, pcols)[:mc]


def tsqr_form_q(
    f: TSQRFactors, precision: str = "highest"
) -> jnp.ndarray:
    """Reduced Q (M, n) without materializing an M×n identity (the r1 path
    allocated a full eye — 2 GiB at the 1048576×512 config): the tree levels
    act on (p, n, n) top blocks seeded with I_n at the root only, and the
    leaf apply exploits C = [top; 0]:  Q_leaf C = C − V Tᵀ (V₁ᵀ top)."""
    prec = resolve_precision(precision)
    m, n = f.shape
    lr = f.leaf_rows
    p = m // lr
    plan = f.plan

    tops = jnp.zeros((p, n, n), f.packed_leaves.dtype)
    tops = tops.at[0].set(jnp.eye(n, dtype=f.packed_leaves.dtype))
    for level, (pk, tl, _cnt, _a) in zip(plan[::-1], f.levels[::-1]):
        ncomb, a_l, flat, rem = level
        gather = jnp.asarray(flat)
        stack = tops[gather].reshape(ncomb, a_l * n, n)
        new = jax.vmap(lambda pkx, tm, st: larfb_body(pkx, tm, st, False, prec))(
            pk, tl, stack
        )
        tops = tops.at[gather].set(new.reshape(ncomb * a_l, n, n))

    def leaf_q(packed, t, top):
        # [top; 0] − V T (V₁ᵀ top): only the (n, n) top block feeds W
        rows = jax.lax.broadcasted_iota(jnp.int32, packed.shape, 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, packed.shape, 1)
        v = jnp.where(rows > cols, packed, jnp.zeros_like(packed)) + jnp.where(
            rows == cols, jnp.ones_like(packed), jnp.zeros_like(packed)
        )
        w = jnp.dot(v[:n].T, top, precision=prec,
                    preferred_element_type=acc_type(packed.dtype)).astype(packed.dtype)
        w = jnp.dot(t, w, precision=prec, preferred_element_type=acc_type(packed.dtype)).astype(
            packed.dtype
        )
        out = -jnp.dot(v, w, precision=prec, preferred_element_type=acc_type(packed.dtype)).astype(
            packed.dtype
        )
        return out.at[:n, :].add(top)

    qb = jax.vmap(leaf_q)(f.packed_leaves.reshape(p, lr, n), f.t_leaves, tops)
    return qb.reshape(m, n)
