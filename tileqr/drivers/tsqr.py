"""Tall-skinny TSQR binary-tree driver (reference component C8, SURVEY.md
§3.2; BASELINE.json:9 config — 1048576×512).

The reference splits an M×nb panel into M/nb row-block leaves, GEQRTs every
leaf, then runs log2(M/nb) TTQRT tree levels to one R — the communication-
avoiding CAQR reduction [BASELINE.json:5, PAPERS.md Demmel CAQR]. TPU-native
realization:
  * leaves: ONE pallas_call with grid=(p,), each program factoring its
    (nb, n) leaf in VMEM (Pallas pipelines leaf DMAs against compute);
  * tree levels: the pair combines at each level are independent, so each
    level is one `jax.vmap` of the TTQRT kernel over the pair axis (vmap of
    a pallas_call becomes a leading grid dimension — the Mosaic equivalent
    of a batched kernel launch).
The tree SHAPE is fixed (pair t with t+half, odd survivor passes through) so
outputs are deterministic (BASELINE.json:5 "bitwise-stable").

Apply-Qᵀ replays leaves then levels on the top-n row slices ("tops") of the
target; the level couples are plain vmapped compact-WY matmul pairs
(ssrfb_body) — pure MXU XLA, no kernel needed.
"""

from __future__ import annotations

import functools
from typing import List, NamedTuple, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tileqr.kernels.common import resolve_interpret, resolve_precision, triu
from tileqr.kernels.geqrt import geqrt_in_refs
from tileqr.kernels.larfb import larfb_body
from tileqr.kernels.ssrfb import ssrfb_body
from tileqr.kernels.tsqrt import _tsqrt_call


class TSQRFactors(NamedTuple):
    """packed_leaves: (p, nb, n) leaf GEQRT packed tiles;
    t_leaves: (p, n, n); levels: tuple of (v2 (half, n, n), t2 (half, n, n),
    cnt) per tree level (cnt = candidates entering the level); r: (n, n)."""

    packed_leaves: jnp.ndarray
    t_leaves: jnp.ndarray
    levels: Tuple
    r: jnp.ndarray
    nb: int
    shape: Tuple[int, int]


def _mk_leaf_kernel(ib: int):
    def _leaf_kernel(a_ref, packed_ref, r_ref, t_ref, at_scr, tt_scr):
        nb, n = a_ref.shape
        at_scr[:] = a_ref[:].T
        tt_scr[:] = jnp.zeros_like(tt_scr)
        geqrt_in_refs(at_scr, tt_scr, n, ib=ib)
        packed = at_scr[:].T
        packed_ref[:] = packed
        r_ref[0] = triu(packed[:n, :])
        t_ref[0] = tt_scr[:].T

    return _leaf_kernel


@functools.partial(jax.jit, static_argnames=("nb", "ib", "interpret"))
def _leaves(a, nb: int, ib: int, interpret: bool):
    m, n = a.shape
    p = m // nb
    dt = a.dtype
    return pl.pallas_call(
        _mk_leaf_kernel(ib),
        grid=(p,),
        in_specs=[pl.BlockSpec((nb, n), lambda i: (i, 0), memory_space=pltpu.VMEM)],
        out_shape=(
            jax.ShapeDtypeStruct((m, n), dt),
            jax.ShapeDtypeStruct((p, n, n), dt),
            jax.ShapeDtypeStruct((p, n, n), dt),
        ),
        out_specs=(
            pl.BlockSpec((nb, n), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, n), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, n), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((n, nb), dt),
            pltpu.VMEM((n, n), dt),
        ],
        interpret=interpret,
    )(a)


def tsqr_factor(
    a: jnp.ndarray, nb: int, ib: int = 32, interpret: bool | None = None
) -> TSQRFactors:
    """TSQR-factor a tall-skinny A (M, n) with n <= nb, M % nb == 0."""
    m, n = a.shape
    if n > nb:
        raise ValueError(f"tsqr requires n={n} <= nb={nb}")
    if m % nb:
        raise ValueError(f"M={m} not a multiple of nb={nb}")
    interp = resolve_interpret(interpret)
    packed, rs, ts = _leaves(a, nb, min(ib, n), interp)

    batched_ttqrt = jax.vmap(lambda r1, r2: _tsqrt_call(r1, r2, interp))
    levels: List = []
    cnt = m // nb
    while cnt > 1:
        half = (cnt + 1) // 2
        pairs = cnt - half
        r_new, v2, t2 = batched_ttqrt(rs[:pairs], rs[half : half + pairs])
        rs = jnp.concatenate([r_new, rs[pairs:half]], axis=0) if pairs < half else r_new
        levels.append((v2, t2, cnt))
        cnt = half
    return TSQRFactors(packed, ts, tuple(levels), rs[0], nb, (m, n))


def tsqr_apply_q(
    f: TSQRFactors,
    c: jnp.ndarray,
    trans: bool = True,
    precision: str = "highest",
    interpret: bool | None = None,
):
    """C ← Qᵀ C (trans) or Q C for the TSQR Q. c: (M, P)."""
    prec = resolve_precision(precision)
    m, n = f.shape
    nb = f.nb
    p = m // nb
    _, pcols = c.shape

    cb = c.reshape(p, nb, pcols)

    def leaf_apply(packed, t, cblk):
        return larfb_body(packed, t, cblk, trans, prec)

    def level_apply(tops, level):
        v2, t2, cnt = level
        half = (cnt + 1) // 2
        pairs = cnt - half
        a_t = tops[:pairs]
        b_t = tops[half : half + pairs]
        new_a, new_b = jax.vmap(lambda v, t, ct, cbm: ssrfb_body(v, t, ct, cbm, trans, prec))(
            v2, t2, a_t, b_t
        )
        tops = tops.at[:pairs].set(new_a)
        tops = tops.at[half : half + pairs].set(new_b)
        return tops

    if trans:
        cb = jax.vmap(leaf_apply)(f.packed_leaves.reshape(p, nb, n), f.t_leaves, cb)
        tops = cb[:, :n, :]
        for level in f.levels:
            tops = level_apply(tops, level)
        cb = cb.at[:, :n, :].set(tops)
    else:
        tops = cb[:, :n, :]
        for level in reversed(f.levels):
            tops = level_apply(tops, level)
        cb = cb.at[:, :n, :].set(tops)
        cb = jax.vmap(leaf_apply)(f.packed_leaves.reshape(p, nb, n), f.t_leaves, cb)
    return cb.reshape(m, pcols)
