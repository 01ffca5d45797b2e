"""Unit tests for the L0 oracle tile ops (SURVEY.md §4 unit tier).

Checks the kernel math contracts of SURVEY.md §2.2 against
numpy.linalg.qr (sign-fixed) and against algebraic identities
(orthogonality, reconstruction, triangular structure).
"""

import numpy as np
import pytest

from tileqr.ref import tile_ops as ops


def sign_fix(q, r):
    """Flip signs so diag(R) >= 0 — canonical form for QR comparison."""
    s = np.sign(np.diag(r))
    s = np.where(s == 0, 1, s)
    return q * s[None, :], r * s[:, None]


def reconstruct_q(v, t):
    m, n = v.shape
    return np.eye(m, dtype=v.dtype) - v @ t @ v.T


@pytest.mark.parametrize("dtype", [np.float32, np.float64])
@pytest.mark.parametrize("m,n", [(64, 64), (96, 48), (128, 128)])
def test_geqrt_matches_numpy(rng, dtype, m, n):
    a = rng.standard_normal((m, n)).astype(dtype)
    packed, t = ops.geqrt(a)
    r = np.triu(packed[:n, :])
    q_np, r_np = np.linalg.qr(a.astype(np.float64))
    _, r_fix = sign_fix(q_np, r_np)
    _, r_ours = sign_fix(np.eye(n), r.astype(np.float64))
    tol = 1e-4 if dtype == np.float32 else 1e-12
    assert np.linalg.norm(r_ours - r_fix) / np.linalg.norm(r_fix) < tol


@pytest.mark.parametrize("m,n", [(64, 64), (96, 48)])
def test_geqrt_compact_wy_orthogonal(rng, m, n):
    a = rng.standard_normal((m, n))
    packed, t = ops.geqrt(a)
    v = ops.unpack_v(packed, n)
    q = reconstruct_q(v, t)
    # Q orthogonal and Q^T A = [R; 0]
    assert np.linalg.norm(q.T @ q - np.eye(m)) < 1e-12 * m
    qta = q.T @ a
    r = np.triu(packed[:n, :])
    assert np.linalg.norm(qta[:n] - r) < 1e-12 * np.linalg.norm(a)
    assert np.linalg.norm(qta[n:]) < 1e-12 * np.linalg.norm(a)
    # T upper-triangular, V unit lower-trapezoidal
    assert np.allclose(t, np.triu(t))
    assert np.allclose(np.diag(v[:n, :n]), 1)
    assert np.allclose(np.triu(v[:n, :n], 1), 0)


def test_larfb_equals_explicit_q(rng):
    m, n, p = 96, 64, 40
    a = rng.standard_normal((m, n))
    c = rng.standard_normal((m, p))
    packed, t = ops.geqrt(a)
    v = ops.unpack_v(packed, n)
    q = reconstruct_q(v, t)
    assert np.allclose(ops.larfb(packed, t, c, trans=True), q.T @ c, atol=1e-10)
    assert np.allclose(ops.larfb(packed, t, c, trans=False), q @ c, atol=1e-10)


def test_tsqrt_ssrfb_couple(rng):
    n, m, p = 48, 64, 32
    r0 = np.triu(rng.standard_normal((n, n)))
    b = rng.standard_normal((m, n))
    r1, v2, t2 = ops.tsqrt(r0, b)
    # couple Q from structured V = [I; V2]
    v = np.vstack([np.eye(n), v2])
    q = np.eye(n + m) - v @ t2 @ v.T
    stacked = np.vstack([r0, b])
    qts = q.T @ stacked
    assert np.linalg.norm(q.T @ q - np.eye(n + m)) < 1e-12 * (n + m)
    assert np.allclose(qts[:n], np.triu(r1), atol=1e-10)
    assert np.linalg.norm(qts[n:]) < 1e-10
    # SSRFB application matches explicit Q^T on a fresh couple
    c_top = rng.standard_normal((n, p))
    c_bot = rng.standard_normal((m, p))
    got_top, got_bot = ops.ssrfb(v2, t2, c_top, c_bot, trans=True)
    want = q.T @ np.vstack([c_top, c_bot])
    assert np.allclose(np.vstack([got_top, got_bot]), want, atol=1e-10)
    got_top, got_bot = ops.ssrfb(v2, t2, c_top, c_bot, trans=False)
    want = q @ np.vstack([c_top, c_bot])
    assert np.allclose(np.vstack([got_top, got_bot]), want, atol=1e-10)


def test_ttqrt_triangle_structure(rng):
    n = 48
    r1 = np.triu(rng.standard_normal((n, n)))
    r2 = np.triu(rng.standard_normal((n, n)))
    r_out, v2, t2 = ops.ttqrt(r1, r2)
    # V2 inherits the upper-triangular TT structure
    assert np.allclose(v2, np.triu(v2))
    v = np.vstack([np.eye(n), v2])
    q = np.eye(2 * n) - v @ t2 @ v.T
    qts = q.T @ np.vstack([r1, r2])
    assert np.allclose(qts[:n], np.triu(r_out), atol=1e-10)
    assert np.linalg.norm(qts[n:]) < 1e-10


def test_larfg_zero_column():
    x = np.zeros(8, dtype=np.float64)
    x[0] = 3.0
    beta, v, tau = ops._larfg(x)
    assert tau == 0 and beta == 3.0
    packed, t = ops.geqrt(np.zeros((16, 8)))
    assert np.allclose(packed, 0) and np.allclose(t, 0)
