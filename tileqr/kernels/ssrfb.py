"""SSRFB/TSMQR — couple-reflector application (reference component C4).

Applies the TSQRT reflector pair to a tile pair:
[C_top; C_bot] ← (I − Ṽ T2 Ṽᵀ)^{T?} [C_top; C_bot] with Ṽ = [I; V2].
The flop-dominant kernel of the whole factorization (>90% of flops,
SURVEY.md §3.1) — the top-block update is matmul-free:
  W = T2^{T?} (C_top + V2ᵀ C_bot);  C_top −= W;  C_bot −= V2 W.
[SURVEY.md §2.1 C4, §2.2; PLASMA xSSRFB/xTSMQR]. ``ssrfb_body`` is shared by
the fused trailing-update kernel (kernels/update.py); TTMQR (tree-apply,
component C5) is this body with upper-triangular V2.
"""

from __future__ import annotations

import functools

import jax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tileqr.kernels.common import dot, dot_t, resolve_interpret, resolve_precision


def ssrfb_body(v2, t2, c_top, c_bot, trans: bool, precision):
    """Returns (c_top', c_bot')."""
    w = c_top + dot_t(v2, c_bot, precision)
    w = dot_t(t2, w, precision) if trans else dot(t2, w, precision)
    return c_top - w, c_bot - dot(v2, w, precision)


def _mk_kernel(trans: bool, precision):
    def kernel(v2_ref, t2_ref, ctop_ref, cbot_ref, otop_ref, obot_ref):
        top, bot = ssrfb_body(
            v2_ref[:], t2_ref[:], ctop_ref[:], cbot_ref[:], trans, precision
        )
        otop_ref[:] = top
        obot_ref[:] = bot

    return kernel


@functools.partial(jax.jit, static_argnames=("trans", "precision", "interpret"))
def _ssrfb_call(v2, t2, c_top, c_bot, trans: bool, precision: str, interpret: bool):
    return pl.pallas_call(
        _mk_kernel(trans, resolve_precision(precision)),
        out_shape=(
            jax.ShapeDtypeStruct(c_top.shape, c_top.dtype),
            jax.ShapeDtypeStruct(c_bot.shape, c_bot.dtype),
        ),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 4,
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(v2, t2, c_top, c_bot)


def ssrfb(v2, t2, c_top, c_bot, trans=True, precision="highest", interpret=None):
    """Standalone SSRFB on one couple: V2 (m,n), T2 (n,n), C_top (n,p), C_bot (m,p)."""
    return _ssrfb_call(v2, t2, c_top, c_bot, trans, precision, resolve_interpret(interpret))
