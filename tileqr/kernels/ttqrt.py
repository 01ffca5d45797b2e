"""TTQRT/TTMQR — triangle-on-triangle tree combine (reference component C5).

Merges two upper-triangular R factors from independent subproblems into one —
the communication-avoiding TSQR tree step for tall-skinny inputs
[SURVEY.md §2.1 C5, BASELINE.json:5,9; Demmel CAQR]. Algebraically TTQRT is
TSQRT with an upper-triangular B: the couple stack [R1; R2] (2n×n) has
reflector j supported on rows {j} ∪ {n..n+j} only.

TPU-native structure exploitation: the classic "~half the flops" of a scalar
TTQRT comes from skipping B's zero lower triangle. On TPU, per-element
skipping is meaningless (ops are vector-width), but the support bound IS
exploitable as a *lane window*: while eliminating column block [s, e), every
reflector and every updated value lives in stack rows [0, n+e) — so the
column loop's rank-1 traffic, the gram matmul, and the MXU block-apply can
all run on a statically-sliced (…, n+⌈e⌉₁₂₈) window of the transposed scratch
instead of the full 2n lanes (`geqrt_in_refs(lane_extent=...)`,
kernels/geqrt.py). For the first of two nb=256/ib=128 blocks that is 384 of
512 lanes; the excluded lanes hold exact zeros, so outputs are
bitwise-identical to the generic TSQRT on the same couple (pinned by
tests/test_kernels.py::test_ttqrt_matches_tsqrt_bitwise).

TTMQR (the apply side) applies the couple reflectors to a tile pair:
[C1; C2] ← (I − Ṽ T2 Ṽᵀ)ᵀ [C1; C2], Ṽ = [I; V2] with V2 upper-triangular.
Both its matmuls (V2ᵀC2, V2·W) are full-rank MXU contractions whose
triangular operand offers no shape to shrink — masking V2 is the only
structural action available, and ssrfb's body already does exactly that, so
ttmqr delegates to it (see kernels/ssrfb.py:ssrfb_body).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tileqr.kernels.common import resolve_interpret
from tileqr.kernels.geqrt import geqrt_in_refs
from tileqr.kernels.ssrfb import ssrfb


def _round_up_128(x: int) -> int:
    return (x + 127) // 128 * 128


def _ttqrt_kernel(r1_ref, r2_ref, r_out_ref, v2_ref, t2_ref, at_scr, tt_scr):
    n = r1_ref.shape[0]
    at_scr[:, :n] = r1_ref[:].T
    at_scr[:, n:] = r2_ref[:].T
    tt_scr[:] = jnp.zeros_like(tt_scr)
    geqrt_in_refs(
        at_scr,
        tt_scr,
        n,
        lane_extent=lambda e: n + _round_up_128(e),
    )
    r_out_ref[:] = at_scr[:, :n].T
    v2_ref[:] = at_scr[:, n:].T  # upper-triangular by construction
    t2_ref[:] = tt_scr[:].T


@functools.partial(jax.jit, static_argnames=("interpret",))
def _ttqrt_call(r1, r2, interpret: bool):
    n = r1.shape[0]
    dt = r1.dtype
    return pl.pallas_call(
        _ttqrt_kernel,
        out_shape=(
            jax.ShapeDtypeStruct((n, n), dt),
            jax.ShapeDtypeStruct((n, n), dt),
            jax.ShapeDtypeStruct((n, n), dt),
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((n, 2 * n), dt),
            pltpu.VMEM((n, n), dt),
        ],
        interpret=interpret,
    )(r1, r2)


def ttqrt(r1: jnp.ndarray, r2: jnp.ndarray, interpret: bool | None = None):
    """TTQRT: (R1, R2 both n×n upper-tri) → (R, V2 upper-tri, T2)."""
    return _ttqrt_call(r1, r2, resolve_interpret(interpret))


def ttmqr(
    v2: jnp.ndarray,
    t2: jnp.ndarray,
    c_top: jnp.ndarray,
    c_bot: jnp.ndarray,
    trans: bool = True,
    precision: str = "highest",
    interpret: bool | None = None,
):
    """TTMQR: apply a TTQRT reflector pair to the tile couple [C1; C2].

    Identical contraction shapes to SSRFB (see module docstring for why the
    triangular V2 yields no MXU shape reduction on the apply side); ttqrt's
    V2 carries exact strictly-lower zeros, so the shared dense body computes
    the triangular contraction exactly.
    """
    return ssrfb(
        v2, t2, c_top, c_bot, trans=trans, precision=precision, interpret=interpret
    )
