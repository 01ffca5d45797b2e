"""Right-looking tiled QR driver (reference component C7, SURVEY.md §3.1).

The reference drives the tile DAG with a host loop launching CUDA kernels on
streams with events + right-looking lookahead [BASELINE.json:5]. The TPU-
native replacement: a trace-time-unrolled Python loop over panels inside one
``jax.jit``, emitting a handful of fused pallas_calls per panel; concurrency
that CUDA got from streams comes from *within* each fused kernel (Pallas
double-buffers tile DMAs against compute). The matrix buffer A is updated in
place (input/output aliasing) and is passed to every kernel EXACTLY once —
reflector factors travel in separate stacked arrays, because an operand that
both aliases the output and feeds a second input forces XLA to materialize a
defensive full-matrix copy per call (measured ~0.6 ms each at 8192²).

Chunked elimination (kernels/chain.py): the sub-diagonal is processed in
couples of ``chunk`` tiles (plus a ≤chunk-1 tile "head" at tile granularity
for block alignment). chunk=1 reproduces the reference's flat-tree tile
algebra exactly; larger chunks cut the latency-bound panel column-loop count
by ~chunk× and the update flops by up to 1/3 (amortized T-apply).

Factor layout (QR factors of panel k):
  r_diag[k]: final diagonal R tile. t_geqrt[k]: compact-WY T of the GEQRT.
  panels[k] = (v_stack, t2_head, v_chunks, t2_chunks): v_stack
  (1+n_head, nb, nb) = packed GEQRT tile + head V2 tiles; v_chunks
  (n_chunks, chunk·nb, nb) = tall dense V2 chunks. A's upper triangle holds
  the off-diagonal R tiles; its sub-diagonal content is unspecified.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from tileqr.kernels.chain import couple_strip, larfb_strip, panel_chain
from tileqr.kernels.panel import panel_factor


def _chunk_for(mt: int, chunk: int) -> int:
    """Largest c <= chunk dividing mt (static, deterministic per shape)."""
    for c in range(min(chunk, mt), 0, -1):
        if mt % c == 0:
            return c
    return 1


def _segments(k: int, mt: int, c: int) -> Tuple[int, int, int]:
    """(n_head, base_block, n_chunks) for panel k's sub-diagonal."""
    rem = mt - k - 1
    n_head = min((c - (k + 1) % c) % c, rem)
    align = k + 1 + n_head
    n_chunks = (mt - align) // c
    return n_head, align // c, n_chunks


@functools.partial(
    jax.jit, static_argnames=("nb", "ib", "chunk", "precision", "interpret")
)
def qr_tiled(
    a: jnp.ndarray,
    nb: int,
    ib: int = 128,
    chunk: int = 4,
    precision: str = "highest",
    interpret: bool = False,
):
    """Factor A (M, N; multiples of nb) in place.

    Returns (a, r_diag, t_geqrt, panels) in the module-docstring layout.
    """
    m, n = a.shape
    mt, nt = m // nb, n // nb
    k_max = min(mt, nt)
    c = _chunk_for(mt, chunk)

    r_diag, t_geqrt, panels = [], [], []
    for k in range(k_max):
        n_head, base, nc = _segments(k, mt, c)
        r_k, v_stack, tg_k, t2h = panel_factor(
            a, k, nb, ib=ib, n_couples=n_head, interpret=interpret
        )
        if nc > 0:
            r_k, v_chunks, t2t = panel_chain(
                a, r_k, k, nb, base, nc, c * nb, ib=ib, interpret=interpret
            )
        else:
            v_chunks = jnp.zeros((0, c * nb, nb), a.dtype)
            t2t = jnp.zeros((0, nb, nb), a.dtype)
        r_diag.append(r_k)
        t_geqrt.append(tg_k)
        panels.append((v_stack, t2h, v_chunks, t2t))

        nt_rem = nt - k - 1
        if nt_rem > 0:
            # the diagonal-tile LARFB is fused into the first couple sweep
            # (one fewer dispatch + one fewer strip HBM round-trip per panel)
            strip = a[k * nb : (k + 1) * nb, (k + 1) * nb :]
            if n_head > 0:
                a, strip = couple_strip(
                    v_stack, t2h, a, strip, 1, k + 1, n_head, nb, nb, k + 1,
                    trans=True, precision=precision, interpret=interpret,
                    vkk=v_stack[0], tg=tg_k,
                )
                if nc > 0:
                    a, strip = couple_strip(
                        v_chunks, t2t, a, strip, 0, base, nc, c * nb, nb, k + 1,
                        trans=True, precision=precision, interpret=interpret,
                    )
            elif nc > 0:
                a, strip = couple_strip(
                    v_chunks, t2t, a, strip, 0, base, nc, c * nb, nb, k + 1,
                    trans=True, precision=precision, interpret=interpret,
                    vkk=v_stack[0], tg=tg_k,
                )
            else:
                strip = larfb_strip(
                    v_stack[0], tg_k, strip, nb, trans=True,
                    precision=precision, interpret=interpret,
                )
            a = jax.lax.dynamic_update_slice(a, strip, (k * nb, (k + 1) * nb))
    return a, jnp.stack(r_diag), jnp.stack(t_geqrt), tuple(panels)


def assemble_r(packed: jnp.ndarray, r_diag: jnp.ndarray, nb: int) -> jnp.ndarray:
    """R = triu(packed) with the stale diagonal tiles replaced by r_diag."""
    m, n = packed.shape
    mt, nt = m // nb, n // nb
    k_max = min(mt, nt)
    r = jnp.triu(packed)
    rt = r.reshape(mt, nb, nt, nb)
    idx = jnp.arange(k_max)
    rt = rt.at[idx, :, idx, :].set(jax.vmap(jnp.triu)(r_diag))
    return rt.reshape(m, n)


@functools.partial(
    jax.jit,
    static_argnames=("nb", "chunk", "trans", "precision", "interpret", "triangular"),
)
def apply_q_tiled(
    panels: Tuple,
    t_geqrt: jnp.ndarray,
    c_mat: jnp.ndarray,
    nb: int,
    chunk: int = 4,
    trans: bool = True,
    precision: str = "highest",
    interpret: bool = False,
    triangular: bool = False,
):
    """C ← Qᵀ C (trans) or Q C, replaying the (possibly chunked) tiled
    reflectors (LAPACK xORMQR semantics; SURVEY.md §3.4). c_mat: (M, P),
    P a multiple of nb. ``chunk`` must match the factorization's.

    triangular (trans=False only): LAPACK xORGQR's growing-window trick for
    C with eye-like column structure (column tile j zero below row tile j,
    as the identity is): in reverse panel order, panel k is an EXACT no-op
    on column tiles < k — W = V₂ᵀC_bot sums over all-zero rows — so each
    panel's sweep starts at column tile k, halving the Q-formation flops.
    Only valid for such C (api.orgqr); a general C must use the full sweep.
    """
    m, _p = c_mat.shape
    mt = m // nb
    k_max = len(panels)
    c = _chunk_for(mt, chunk)
    assert not (triangular and trans), "triangular window applies to Q·C only"

    def one_panel(cm, k):
        if triangular and k * nb >= _p:
            # reduced-ncols orgqr: the growing window starts right of C's
            # last column — the panel is an exact no-op on the eye-structured
            # C (same argument as the window itself), and slicing would pass
            # a zero-width strip / negative column count downstream
            return cm
        n_head, base, nc = _segments(k, mt, c)
        v_stack, t2h, v_chunks, t2t = panels[k]
        cs = k if triangular else 0  # first column tile this panel touches
        strip = cm[k * nb : (k + 1) * nb, cs * nb :]
        if trans:
            # LARFB fused into the first couple sweep (factor order)
            if n_head > 0:
                cm, strip = couple_strip(
                    v_stack, t2h, cm, strip, 1, k + 1, n_head, nb, nb, 0,
                    trans=True, precision=precision, interpret=interpret,
                    vkk=v_stack[0], tg=t_geqrt[k],
                )
                if nc > 0:
                    cm, strip = couple_strip(
                        v_chunks, t2t, cm, strip, 0, base, nc, c * nb, nb, 0,
                        trans=True, precision=precision, interpret=interpret,
                    )
            elif nc > 0:
                cm, strip = couple_strip(
                    v_chunks, t2t, cm, strip, 0, base, nc, c * nb, nb, 0,
                    trans=True, precision=precision, interpret=interpret,
                    vkk=v_stack[0], tg=t_geqrt[k],
                )
            else:
                strip = larfb_strip(
                    v_stack[0], t_geqrt[k], strip, nb, trans=True,
                    precision=precision, interpret=interpret,
                )
        else:
            # LARFB fused into the last couple sweep (Q-apply order)
            if nc > 0:
                cm, strip = couple_strip(
                    v_chunks, t2t, cm, strip, 0, base, nc, c * nb, nb, cs,
                    trans=False, reverse=True, precision=precision, interpret=interpret,
                    vkk=None if n_head > 0 else v_stack[0],
                    tg=None if n_head > 0 else t_geqrt[k],
                )
            if n_head > 0:
                cm, strip = couple_strip(
                    v_stack, t2h, cm, strip, 1, k + 1, n_head, nb, nb, cs,
                    trans=False, reverse=True, precision=precision, interpret=interpret,
                    vkk=v_stack[0], tg=t_geqrt[k],
                )
            if n_head == 0 and nc == 0:
                strip = larfb_strip(
                    v_stack[0], t_geqrt[k], strip, nb, trans=False,
                    precision=precision, interpret=interpret,
                )
        return jax.lax.dynamic_update_slice(cm, strip, (k * nb, cs * nb))

    ks = range(k_max) if trans else range(k_max - 1, -1, -1)
    for k in ks:
        c_mat = one_panel(c_mat, k)
    return c_mat
