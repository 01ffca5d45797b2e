"""Verification utilities (reference component C10, SURVEY.md §2.1).

The reference checks reconstruction residual ‖A−QR‖F/‖A‖F and per-tile
GPU-vs-CPU agreement; orthogonality ‖QᵀQ−I‖F is the standard companion.
These helpers compute the acceptance metrics the way BASELINE.md mandates:
in float64 on host — verifying with an on-device default-precision matmul
(bf16) misreports relerr by ~1e-3.
"""

from __future__ import annotations

from typing import Dict

import numpy as np


def qr_check(a, q, r) -> Dict[str, float]:
    """Acceptance metrics for a computed QR: reconstruction relerr,
    orthogonality defect, and R-triangularity defect (all float64)."""
    a = np.asarray(a, np.float64)
    q = np.asarray(q, np.float64)
    r = np.asarray(r, np.float64)
    na = np.linalg.norm(a)
    k = q.shape[1]
    return {
        "relerr": float(np.linalg.norm(a - q @ r) / (na if na else 1.0)),
        "orth": float(np.linalg.norm(q.T @ q - np.eye(k))),
        "r_lower": float(np.linalg.norm(np.tril(r[: r.shape[1]], -1))),
    }


def residual_via_qt(a, qta, r) -> float:
    """‖QᵀA − R‖F/‖A‖F — the cheap residual (no Q formation): by
    orthogonality it equals ‖A − QR‖F/‖A‖F."""
    a = np.asarray(a, np.float64)
    qta = np.asarray(qta, np.float64)
    r = np.asarray(r, np.float64)
    return float(np.linalg.norm(qta - r) / np.linalg.norm(a))


def tiles_bitwise_equal(x, y) -> bool:
    """The reference's 'bitwise-stable tile outputs' gate: exact equality
    across reruns on the same backend (also the race detector)."""
    import jax

    xs = jax.tree_util.tree_leaves(x)
    ys = jax.tree_util.tree_leaves(y)
    return len(xs) == len(ys) and all(
        (np.asarray(xa) == np.asarray(ya)).all() for xa, ya in zip(xs, ys)
    )


def sign_canonical_r(r):
    """Flip row signs so diag(R) >= 0 — canonical form for comparing Rs from
    different elimination orders (QR is unique only up to column signs)."""
    r = np.asarray(r)
    k = min(r.shape)
    s = np.sign(np.diag(r)[:k])
    s[s == 0] = 1
    out = r.copy()
    out[:k] = r[:k] * s[:, None]
    return out
