"""TTQRT/TTMQR — triangle-on-triangle tree combine (reference component C5).

Merges two upper-triangular R factors from independent subproblems into one —
the communication-avoiding TSQR tree step for tall-skinny inputs
[SURVEY.md §2.1 C5, BASELINE.json:5,9; Demmel CAQR]. Structurally TTQRT is
TSQRT with an upper-triangular B, whose zero pattern the masked generic body
preserves for free (V2 comes out upper-triangular); the dedicated entry point
exists for API parity and as the hook for a future structure-exploiting
specialization (~half the flops of the generic couple).

TTMQR (the apply side) is SSRFB with triangular V2 — see kernels/ssrfb.py.
"""

from __future__ import annotations

import jax.numpy as jnp

from tileqr.kernels.tsqrt import tsqrt


def ttqrt(r1: jnp.ndarray, r2: jnp.ndarray, interpret: bool | None = None):
    """Standalone TTQRT: (R1, R2 both n×n upper-tri) → (R, V2 upper-tri, T2)."""
    return tsqrt(r1, r2, interpret=interpret)
