"""Batched CholeskyQR2 path (drivers/cholqr.py — VERDICT r2 next-#6):
grouped Pallas POTRF + matmul-only triangular inverse and orthogonality
correction, against numpy oracles."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import tileqr
from tileqr import QRConfig
from tileqr.drivers.cholqr import (
    _triu_inv_doubling,
    cholqr2_batched,
    potrf_batched,
)


def test_potrf_matches_numpy(rng):
    a = rng.standard_normal((8, 64, 32)).astype(np.float32)
    g = np.einsum("bij,bik->bjk", a, a).astype(np.float32)
    r = np.asarray(potrf_batched(jnp.asarray(g), group=4, bp=8), np.float64)
    for i in range(8):
        r_np = np.linalg.cholesky(g[i].astype(np.float64)).T
        assert np.linalg.norm(r[i] - r_np) / np.linalg.norm(r_np) < 1e-6
        # strictly-lower part is exactly zero (masked writes)
        assert (np.tril(r[i], -1) == 0).all()


def test_potrf_tail_block(rng):
    """n not a multiple of bp exercises the short tail block."""
    a = rng.standard_normal((4, 50, 24)).astype(np.float32)
    g = np.einsum("bij,bik->bjk", a, a).astype(np.float32)
    r = np.asarray(potrf_batched(jnp.asarray(g), group=2, bp=16), np.float64)
    r_np = np.linalg.cholesky(g[0].astype(np.float64)).T
    assert np.linalg.norm(r[0] - r_np) / np.linalg.norm(r_np) < 1e-6


def test_triu_inv_doubling(rng):
    # well-conditioned triangular: tight gate (cholqr2 feeds it chol factors
    # of normalized grams, this regime); generic random triangular powers
    # amplify fp32 rounding, so that class gets a loose sanity gate only
    r = np.triu(0.1 * rng.standard_normal((4, 48, 48))).astype(np.float32)
    r[:, np.arange(48), np.arange(48)] = (
        np.abs(r[:, np.arange(48), np.arange(48)]) + 1.0
    )
    ri = np.asarray(
        _triu_inv_doubling(jnp.asarray(r), jax.lax.Precision.HIGHEST),
        np.float64,
    )
    for i in range(4):
        assert np.abs(ri[i] @ r[i] - np.eye(48)).max() < 1e-5
    r2 = np.triu(rng.standard_normal((2, 48, 48))).astype(np.float32)
    r2[:, np.arange(48), np.arange(48)] = (
        np.abs(r2[:, np.arange(48), np.arange(48)]) + 1.0
    )
    ri2 = np.asarray(
        _triu_inv_doubling(jnp.asarray(r2), jax.lax.Precision.HIGHEST),
        np.float64,
    )
    assert np.abs(ri2[0] @ r2[0] - np.eye(48)).max() < 1e-2


def test_cholqr2_residual_and_orthogonality(rng):
    a = rng.standard_normal((16, 96, 48)).astype(np.float32)
    q, r = cholqr2_batched(jnp.asarray(a), group=8, bp=16)
    q = np.asarray(q, np.float64)
    r = np.asarray(r, np.float64)
    for i in range(16):
        assert np.linalg.norm(a[i] - q[i] @ r[i]) / np.linalg.norm(a[i]) < 1e-6
        assert np.linalg.norm(q[i].T @ q[i] - np.eye(48)) < 2e-6
        assert (np.tril(r[i], -1) == 0).all()


def test_qr_batched_cholqr2_api(rng):
    """api.qr_batched(batched_method="cholqr2") end to end, unpadded shape."""
    a = rng.standard_normal((6, 45, 20)).astype(np.float32)
    cfg = QRConfig(batched_method="cholqr2")
    q, r = tileqr.qr_batched(a, config=cfg)
    assert q.shape == (6, 45, 20) and r.shape == (6, 20, 20)
    q64 = np.asarray(q, np.float64)
    r64 = np.asarray(r, np.float64)
    for i in range(6):
        assert np.linalg.norm(a[i] - q64[i] @ r64[i]) / np.linalg.norm(a[i]) < 1e-6
    rr = np.asarray(tileqr.qr_batched(a, mode="r", config=cfg), np.float64)
    np.testing.assert_allclose(rr, r64)


def test_tsqr_cholqr2_strategy(rng):
    """tsqr(strategy="cholqr2"): tall-skinny R via one gram + POTRF — no
    Householder column loops (BASELINE.md r3)."""
    a = rng.standard_normal((1024, 48)).astype(np.float32)
    r = np.asarray(tileqr.tsqr(a, mode="r", strategy="cholqr2"), np.float64)
    _, r_np = np.linalg.qr(a.astype(np.float64))
    s = np.sign(np.diag(r_np)) * np.sign(np.diag(r))
    s[s == 0] = 1
    assert np.linalg.norm(r * s[:, None] - r_np) / np.linalg.norm(r_np) < 1e-6
    q, rr = tileqr.tsqr(a, mode="reduced", strategy="cholqr2")
    q = np.asarray(q, np.float64)
    rr = np.asarray(rr, np.float64)
    assert np.linalg.norm(q @ rr - a) / np.linalg.norm(a) < 1e-6
    assert np.linalg.norm(q.T @ q - np.eye(48)) < 5e-6


def test_tsqr_cholqr2_factor_mode(rng):
    """tsqr(mode="factor", strategy="cholqr2") (VERDICT r3 missing-#4):
    whole-panel compact-WY HRFactors via CholeskyQR2 + modified-LU
    Householder reconstruction. Gates: QᵀA = [R; 0] through apply_q, the
    Qᵀ/Q roundtrip is the identity, orgqr's Q matches mode="reduced"'s up
    to the reconstruction's fp32 rounding, and the breakdown guard falls
    back to tree factors on a rank-deficient panel. (m=1024 exercises the
    same single-gram path as the old 2048 at ~60% of the interpret cost —
    r5 fast-suite budget.)"""
    m, n = 1024, 48
    a = rng.standard_normal((m, n)).astype(np.float32)
    f = tileqr.tsqr(a, mode="factor", strategy="cholqr2")
    assert type(f).__name__ == "HRFactors" and len(f.panels) == 1
    r = np.asarray(f.r, np.float64)[:n, :n]
    qta = np.asarray(tileqr.apply_q(f, a, trans=True), np.float64)
    assert np.linalg.norm(qta[:n] - r) / np.linalg.norm(a) < 2e-6
    assert np.linalg.norm(qta[n:]) / np.linalg.norm(a) < 2e-6
    c = rng.standard_normal((m, 8)).astype(np.float32)
    back = np.asarray(
        tileqr.apply_q(f, np.asarray(tileqr.apply_q(f, c, trans=True)))
    )
    assert np.abs(back - c).max() < 5e-6 * np.abs(c).max()
    q = np.asarray(tileqr.orgqr(f, n), np.float64)
    assert q.shape == (m, n)
    assert np.linalg.norm(a - q @ r) / np.linalg.norm(a) < 2e-6
    # guard: duplicate columns break the CholeskyQR contract → tree factors
    b = a.copy()
    b[:, 1] = b[:, 0]
    with pytest.warns(UserWarning, match="hr guard"):
        fb = tileqr.tsqr(b, mode="factor", strategy="cholqr2")
    assert type(fb).__name__ == "TSQRFactors"


def test_tsqr_auto_factor_routes_cholqr2(rng):
    """strategy="auto", mode="factor" routes to the cholqr2-reconstruction
    path — the measured 3.07× factor+apply winner (108.4 vs the tree's
    332.4 ms at config 3, BASELINE.md r4). Before r5, auto resolved to
    "chain" and then silently executed the TREE factor body (VERDICT r4
    weak-#5) — the executed path now matches the resolved name. Healthy
    input → HRFactors bitwise-identical to the explicitly-named strategy;
    breakdown input → tree TSQRFactors with the guard warning (the stable
    backstop)."""
    m, n = 512, 32
    a = rng.standard_normal((m, n)).astype(np.float32)
    f_auto = tileqr.tsqr(a, mode="factor")
    assert type(f_auto).__name__ == "HRFactors"
    f_named = tileqr.tsqr(a, mode="factor", strategy="cholqr2")
    assert (np.asarray(f_auto.r) == np.asarray(f_named.r)).all()
    for (ya, ta), (yn, tn) in zip(f_auto.panels, f_named.panels):
        assert (np.asarray(ya) == np.asarray(yn)).all()
        assert (np.asarray(ta) == np.asarray(tn)).all()
    b = a.copy()
    b[:, 1] = b[:, 0]
    with pytest.warns(UserWarning, match="hr guard"):
        fb = tileqr.tsqr(b, mode="factor")
    assert type(fb).__name__ == "TSQRFactors"


def test_tsqr_auto_factor_stable_when_guard_cannot_act(rng):
    """auto+factor takes the cholqr2 fast route ONLY when the breakdown
    backstop can actually act (r5 review finding): with hr_guard "off" or
    "warn", or under a jax.jit trace (guard_trips cannot host-sync a
    tracer and silently returns False), "auto" must keep the pre-r5
    unconditionally stable tree — otherwise a cond(A) ≳ 1e3 panel would
    silently return garbage HRFactors. Explicit strategy="cholqr2" stays
    the documented opt-in."""
    m, n = 512, 32
    a = rng.standard_normal((m, n)).astype(np.float32)
    for guard in ("off", "warn"):
        f = tileqr.tsqr(a, mode="factor", config=QRConfig(hr_guard=guard))
        assert type(f).__name__ == "TSQRFactors", guard
    f_jit = jax.jit(lambda x: tileqr.tsqr(x, mode="factor"))(a)
    assert type(f_jit).__name__ == "TSQRFactors"
    # closure-captured CONCRETE input under jit (r5 review): `a` is not a
    # Tracer, but the health scalar the guard reads would still emerge as
    # one — the routing must consult the trace state, not the input type
    f_closure = jax.jit(lambda: tileqr.tsqr(a, mode="factor"))()
    assert type(f_closure).__name__ == "TSQRFactors"
    # eager + default hr_guard="fallback": the fast route still wins
    assert type(tileqr.tsqr(a, mode="factor")).__name__ == "HRFactors"


def test_qr_batched_bad_method():
    with pytest.raises(ValueError, match="batched_method"):
        tileqr.qr_batched(
            np.zeros((2, 8, 8), np.float32),
            config=QRConfig(batched_method="nope"),
        )


def test_bdot_pair_rows_matches_reference(rng):
    """Pairwise tall contraction (the √m-error fix, BASELINE.md r3 probe):
    tree-accumulated xᵀy equals the f64 reference; both the tail path
    (m not a block multiple) and the short fallback are exercised."""
    from tileqr.drivers.cholqr import bdot_pair_rows

    hi = jax.lax.Precision.HIGHEST
    for m in (2072, 1024, 600):  # tail, exact blocks, nblk<2 fallback
        x = rng.standard_normal((2, m, 16)).astype(np.float32)
        y = rng.standard_normal((2, m, 8)).astype(np.float32)
        out = np.asarray(
            bdot_pair_rows(jnp.asarray(x), jnp.asarray(y), hi, jnp.float32),
            np.float64,
        )
        ref = np.einsum("bmp,bmq->bpq", x.astype(np.float64), y.astype(np.float64))
        assert np.abs(out - ref).max() / np.abs(ref).max() < 1e-5


def test_bdot_pair_rows_cap_bytes(rng):
    """The partial-stack memory cap reduces the block count, not the
    answer: a tiny cap must fall back toward (and at 1 block, exactly to)
    the plain contraction while staying correct."""
    from tileqr.drivers.cholqr import bdot_pair_rows

    hi = jax.lax.Precision.HIGHEST
    x = rng.standard_normal((1, 4096, 16)).astype(np.float32)
    big = np.asarray(bdot_pair_rows(jnp.asarray(x), jnp.asarray(x), hi, jnp.float32))
    small = np.asarray(
        bdot_pair_rows(jnp.asarray(x), jnp.asarray(x), hi, jnp.float32,
                       cap_bytes=2 * 16 * 16 * 4)
    )
    ref = np.einsum("bmp,bmq->bpq", x.astype(np.float64), x.astype(np.float64))
    for out in (big, small):
        assert np.abs(out - ref).max() / np.abs(ref).max() < 1e-5


def test_tsqr_cholqr2_guard_fallback(rng):
    """tsqr(strategy='cholqr2') on a breakdown input (near-duplicate
    columns → gram numerically singular) must warn and fall back to the
    unconditionally stable auto route, keeping the result accurate."""
    import warnings

    import pytest as _pytest

    import tileqr
    from tileqr import QRConfig

    a = rng.standard_normal((512, 64)).astype(np.float32)
    a[:, 1] = a[:, 0] * (1 + 1e-7)
    cfg = QRConfig(nb=64)
    with _pytest.warns(UserWarning, match="hr guard"):
        q, r = tileqr.tsqr(a, mode="reduced", config=cfg, strategy="cholqr2")
    q64, r64 = np.asarray(q, np.float64), np.asarray(r, np.float64)
    assert np.linalg.norm(q64 @ r64 - a) / np.linalg.norm(a) < 1e-5
    assert np.linalg.norm(q64.T @ q64 - np.eye(64)) < 1e-4
    # healthy input: no warning, cholqr2 result kept
    b = rng.standard_normal((512, 64)).astype(np.float32)
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        r2 = tileqr.tsqr(b, mode="r", config=cfg, strategy="cholqr2")
    assert r2.shape == (64, 64)


def test_qr_batched_cholqr2_guard_fallback(rng):
    """qr_batched(batched_method='cholqr2') with ONE ill-conditioned batch
    member (the documented square-gaussian-tail hazard, BASELINE.md r3:
    a breakdown measured relerr 1e+57) must warn and re-route the whole
    batch through the Householder kernels."""
    import pytest as _pytest

    import tileqr
    from tileqr import QRConfig

    a = rng.standard_normal((8, 64, 32)).astype(np.float32)
    a[3, :, 1] = a[3, :, 0] * (1 + 1e-7)  # one breakdown member
    cfg = QRConfig(nb=32, batched_method="cholqr2")
    with _pytest.warns(UserWarning, match="hr guard"):
        q, r = tileqr.qr_batched(a, config=cfg)
    q64, r64 = np.asarray(q, np.float64), np.asarray(r, np.float64)
    rel = np.linalg.norm(q64 @ r64 - a, axis=(1, 2)) / np.linalg.norm(a, axis=(1, 2))
    assert rel.max() < 1e-5  # EVERY member accurate, incl. the bad one
