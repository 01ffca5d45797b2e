"""Right-looking tiled QR driver (reference component C7, SURVEY.md §3.1).

The reference drives the tile DAG with a host loop launching CUDA kernels on
streams with events + right-looking lookahead [BASELINE.json:5]. The TPU-
native replacement: a trace-time-unrolled Python loop over panels inside one
``jax.jit``, emitting TWO fused pallas_calls per panel — panel_factor (GEQRT
+ TSQRT chain, kernels/panel.py) and couple_apply (LARFB + SSRFB sweep,
kernels/update.py). Concurrency that CUDA got from streams comes instead
from *within* each fused kernel: Pallas double-buffers the tile DMAs against
compute, and XLA schedules the (already coarse-grained) calls back-to-back.
All updates are in place via input/output aliasing on the single HBM matrix
buffer; tile shapes are static per (shape, nb), so each matrix shape compiles
once (SURVEY.md §7.2 item 3).

Factor layout: see ref/blocked_qr.py (identical, tile-for-tile comparable).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from tileqr.kernels.panel import panel_factor
from tileqr.kernels.update import couple_apply, larfb_row


@functools.partial(jax.jit, static_argnames=("nb", "ib", "precision", "interpret"))
def qr_tiled(
    a: jnp.ndarray, nb: int, ib: int = 32, precision: str = "highest", interpret: bool = False
):
    """Factor A (M, N; multiples of nb) in place.

    Returns (packed, r_diag, t_geqrt, t_tsqrt):
      packed: (M, N) — V's below the diagonal blocks, R above; the upper
        triangles of the *diagonal* tiles are stale (the final R_kk of each
        panel lives in r_diag — the chain carries R on-chip and flushes it
        separately to avoid re-writing the packed tile every couple).
      r_diag: (K, nb, nb) final diagonal R tiles.
      t_geqrt: (K, nb, nb) compact-WY T per panel.
      t_tsqrt: tuple of K arrays, (Mt-k, nb, nb) each (slot 0 zero).
    """
    m, n = a.shape
    mt, nt = m // nb, n // nb
    k_max = min(mt, nt)

    r_diag = []
    t_geqrt = []
    t_tsqrt = []
    for k in range(k_max):
        a, r_k, tg_k, t2_k = panel_factor(a, k, nb, ib=ib, interpret=interpret)
        r_diag.append(r_k)
        t_geqrt.append(tg_k)
        t_tsqrt.append(t2_k)
        if nt - k - 1 > 0:
            if mt - k - 1 > 0:
                a, row = couple_apply(
                    a, tg_k, t2_k, a, k, k + 1, nb,
                    trans=True, reverse=False, precision=precision,
                    interpret=interpret,
                )
            else:
                row = larfb_row(
                    a, tg_k, a, k, k + 1, nb,
                    trans=True, precision=precision, interpret=interpret,
                )
            a = jax.lax.dynamic_update_slice(a, row, (k * nb, (k + 1) * nb))
    return a, jnp.stack(r_diag), jnp.stack(t_geqrt), tuple(t_tsqrt)


def assemble_r(packed: jnp.ndarray, r_diag: jnp.ndarray, nb: int) -> jnp.ndarray:
    """R = triu(packed) with the stale diagonal tiles replaced by r_diag."""
    m, n = packed.shape
    mt, nt = m // nb, n // nb
    k_max = min(mt, nt)
    r = jnp.triu(packed)
    # one vectorized scatter over the K diagonal tiles
    rt = r.reshape(mt, nb, nt, nb)
    idx = jnp.arange(k_max)
    rt = rt.at[idx, :, idx, :].set(jax.vmap(jnp.triu)(r_diag))
    r = rt.reshape(m, n)
    # rows below the diagonal of the last panel are zero by construction of
    # triu for n >= m; for m > n, triu already zeroed them.
    return r


@functools.partial(
    jax.jit, static_argnames=("nb", "trans", "precision", "interpret")
)
def apply_q_tiled(
    packed: jnp.ndarray,
    t_geqrt: jnp.ndarray,
    t_tsqrt: Tuple[jnp.ndarray, ...],
    c: jnp.ndarray,
    nb: int,
    trans: bool = True,
    precision: str = "highest",
    interpret: bool = False,
):
    """C ← Qᵀ C (trans) or Q C, replaying the tiled reflectors
    (LAPACK xORMQR semantics on the tiled factors; SURVEY.md §3.4 ORGQR/apply).

    c: (M, P) with P a multiple of nb.
    """
    m, _n = packed.shape
    mt = m // nb
    k_max = len(t_tsqrt)

    def one_panel(c, k):
        n_inner = mt - k - 1
        if n_inner > 0:
            c, row = couple_apply(
                packed, t_geqrt[k], t_tsqrt[k], c, k, 0, nb,
                trans=trans, reverse=not trans, precision=precision,
                interpret=interpret,
            )
        else:
            row = larfb_row(
                packed, t_geqrt[k], c, k, 0, nb,
                trans=trans, precision=precision, interpret=interpret,
            )
        return jax.lax.dynamic_update_slice(c, row, (k * nb, 0))

    ks = range(k_max) if trans else range(k_max - 1, -1, -1)
    for k in ks:
        c = one_panel(c, k)
    return c
