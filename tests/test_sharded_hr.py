"""Gram-panel sharded hr driver (drivers/sharded_hr.py) on the
8-virtual-device CPU mesh: distributed CholeskyQR2 panels + Householder
reconstruction, one psum per phase, plain fori_loop (no dynamic grids).

Accuracy gates are CholeskyQR2-level (BASELINE.md r3: ~1e-6..1e-7 at these
sizes for gaussian inputs, cond ≲ 1e3 contract)."""

import jax
import numpy as np
import pytest

from tileqr import QRConfig
from tileqr.drivers.sharded import qr_sharded
from tileqr.drivers.sharded_hr import (
    apply_q_sharded_hr,
    assemble_r_sharded_hr,
    qr_sharded_factor_hr,
)

needs_8 = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 (virtual) devices"
)


def _relerr_vs_numpy_r(a, r):
    """R-uniqueness check: |R| matches numpy's |R| (sign-canonical)."""
    rn = np.linalg.qr(a.astype(np.float64), mode="r")
    k = min(a.shape)
    return np.abs(np.abs(r[:k]) - np.abs(rn[:k])).max() / np.abs(rn).max()


@needs_8
@pytest.mark.parametrize(
    "mesh_shape", [(4, 2), pytest.param((2, 4), marks=pytest.mark.slow)]
)
def test_hr_sharded_square(rng, mesh_shape):
    mesh = jax.make_mesh(mesh_shape, ("rows", "cols"))
    cfg = QRConfig(nb=16, mesh_shape=mesh_shape)
    a = rng.standard_normal((64, 64)).astype(np.float32)
    f = qr_sharded_factor_hr(a, mesh=mesh, config=cfg)
    r = np.asarray(assemble_r_sharded_hr(f, mesh))
    assert r.shape == a.shape
    assert np.all(np.tril(r, -1) == 0)
    # measured 2.2-4.0e-07 over 3 seeds (r4 gate probe); ~2.5x headroom
    assert _relerr_vs_numpy_r(a, r) < 1e-6


@needs_8
def test_hr_sharded_rectangular_deep(rng):
    """k_max = 16 with M != N: block-cyclic remainders at depth, multiple
    segments exercised (segments=4 over 16 panels)."""
    mesh = jax.make_mesh((4, 2), ("rows", "cols"))
    cfg = QRConfig(nb=8, mesh_shape=(4, 2))
    m, n = 160, 128
    a = rng.standard_normal((m, n)).astype(np.float32)
    f = qr_sharded_factor_hr(a, mesh=mesh, config=cfg, segments=4)
    r = np.asarray(assemble_r_sharded_hr(f, mesh))
    assert r.shape == (m, n)
    # measured 1.6-2.2e-07 (R) / 2.0-2.2e-07 (apply) over 3 seeds (r4 gate
    # probe); the 5e-5 gates were an order looser than the single-chip
    # twins and could hide a reconstruction-algebra regression (VERDICT r3
    # weak-#4)
    assert _relerr_vs_numpy_r(a, r) < 1e-6
    # residual through the apply path: Qᵀ A should reproduce [R; 0]
    qta = np.asarray(apply_q_sharded_hr(f, a, mesh, trans=True, config=cfg))
    assert np.abs(qta[:n] - r[:n]).max() / np.abs(r).max() < 1e-6
    assert np.abs(qta[n:]).max() / np.abs(r).max() < 1e-6


@needs_8
def test_hr_sharded_apply_q_roundtrip(rng):
    """Q (Qᵀ C) = C: the apply path is its own inverse pair."""
    mesh = jax.make_mesh((4, 2), ("rows", "cols"))
    cfg = QRConfig(nb=16, mesh_shape=(4, 2))
    a = rng.standard_normal((64, 32)).astype(np.float32)
    c = rng.standard_normal((64, 16)).astype(np.float32)
    f = qr_sharded_factor_hr(a, mesh=mesh, config=cfg)
    qtc = apply_q_sharded_hr(f, c, mesh, trans=True, config=cfg)
    back = np.asarray(apply_q_sharded_hr(f, np.asarray(qtc), mesh, trans=False, config=cfg))
    # measured 3.3-4.1e-07 over 3 seeds (r4 gate probe)
    assert np.abs(back - c).max() < 1e-6 * np.abs(c).max()


@needs_8
@pytest.mark.slow
def test_hr_sharded_matches_single_device_hr(rng):
    """Same panel algebra as the single-device hr driver ⇒ same R up to
    psum-split reduction order (gated tight, not bitwise). Slow tier: the
    interpret-mode single-device twin dominates (92 s); fast correctness
    coverage rides the numpy-oracle tests above."""
    from tileqr.drivers.square_hr import pad_for_hr, qr_hr

    mesh = jax.make_mesh((4, 2), ("rows", "cols"))
    cfg = QRConfig(nb=16, mesh_shape=(4, 2))
    a = rng.standard_normal((128, 96)).astype(np.float32)
    f = qr_sharded_factor_hr(a, mesh=mesh, config=cfg)
    r_sh = np.asarray(assemble_r_sharded_hr(f, mesh))
    ap, (m, n) = pad_for_hr(np.asarray(a), 16)
    r1, _ = qr_hr(ap, 16, interpret=True)
    r_single = np.asarray(r1)[: min(ap.shape), : ap.shape[1]][:n, :n]
    # compare the shared (n, n) R block; reduction-order delta only
    assert np.abs(np.abs(r_sh[:n, :n]) - np.abs(r_single)).max() <= 2e-5 * np.abs(r_single).max()


@needs_8
def test_hr_sharded_deterministic(rng):
    # smallest mesh with real psums on both axes (fast-suite budget)
    mesh = jax.make_mesh((2, 2), ("rows", "cols"))
    cfg = QRConfig(nb=16, mesh_shape=(2, 2))
    a = rng.standard_normal((32, 32)).astype(np.float32)
    r1 = np.asarray(assemble_r_sharded_hr(qr_sharded_factor_hr(a, mesh=mesh, config=cfg), mesh))
    r2 = np.asarray(assemble_r_sharded_hr(qr_sharded_factor_hr(a, mesh=mesh, config=cfg), mesh))
    assert np.array_equal(r1, r2)


@needs_8
def test_hr_sharded_api_routing(rng):
    """qr_sharded(config=QRConfig(square_method='hr')) routes to the gram
    driver and returns R directly."""
    # routing semantics only — the smallest real mesh keeps this fast
    # (interpret shard_map cost scales with simulated-device count)
    mesh = jax.make_mesh((2, 1), ("rows", "cols"))
    cfg = QRConfig(nb=16, mesh_shape=(2, 1), square_method="hr")
    a = rng.standard_normal((32, 16)).astype(np.float32)
    r = np.asarray(qr_sharded(a, mesh=mesh, config=cfg))
    assert _relerr_vs_numpy_r(a, r) < 1e-6
    f = qr_sharded(a, mesh=mesh, config=cfg, mode="factor")
    assert type(f).__name__ == "ShardedHRFactors"


def test_hr_sharded_1x1_mesh(rng):
    """pr = pc = 1: all psums are no-ops; the driver degenerates to the
    single-device hr algorithm."""
    mesh = jax.make_mesh((1, 1), ("rows", "cols"))
    cfg = QRConfig(nb=16, mesh_shape=(1, 1))
    a = rng.standard_normal((64, 48)).astype(np.float32)
    f = qr_sharded_factor_hr(a, mesh=mesh, config=cfg)
    r = np.asarray(assemble_r_sharded_hr(f, mesh))
    assert _relerr_vs_numpy_r(a, r) < 1e-6


def test_hr_sharded_b3(rng):
    """precision="b3" on the gram-panel sharded driver: the local halves of
    the panel update run as the split Pallas kernels (panel_project /
    panel_sub) with the psum between them; factors stay HIGHEST. Must land
    in the b3 accuracy class on the virtual mesh."""
    mesh = jax.make_mesh((2, 1), ("rows", "cols"))
    cfg = QRConfig(nb=16, mesh_shape=(2, 1), square_method="hr", precision="b3")
    a = rng.standard_normal((64, 32)).astype(np.float32)
    r = np.asarray(qr_sharded(a, mesh=mesh, config=cfg))
    assert _relerr_vs_numpy_r(a, r) < 1e-3


def test_hr_sharded_tall_pairwise_w(rng):
    """Local rows ≥ 2048 on a narrow trailing matrix: the distributed hr
    update's LOCAL W = YᵀC projection takes the pairwise block-accumulation
    branch (VERDICT r3 missing-#3 — the sharded update now carries the same
    accumulation discipline as square_hr._apply_block_t). Gates are ~2.5×
    the measured post-fix values on this exact geometry (r5 session:
    relerr 1.01e-07, top 2.34e-07, tail 2.56e-08 — deterministic seed), so
    a silently-untaken pairwise branch (the √m-grown pre-fix class, ~5×
    worse at this m) actually trips them (VERDICT r4 weak-#4)."""
    mesh = jax.make_mesh((2, 1), ("rows", "cols"))
    cfg = QRConfig(nb=16, mesh_shape=(2, 1))
    m, n = 4096, 64  # 2048 local rows per device → pairwise branch is live
    a = rng.standard_normal((m, n)).astype(np.float32)
    f = qr_sharded_factor_hr(a, mesh=mesh, config=cfg, segments=2)
    r = np.asarray(assemble_r_sharded_hr(f, mesh))
    assert _relerr_vs_numpy_r(a, r) < 2.5e-7
    qta = np.asarray(apply_q_sharded_hr(f, a, mesh, trans=True, config=cfg))
    assert np.abs(qta[:n] - r[:n]).max() / np.abs(r).max() < 6e-7
    assert np.abs(qta[n:]).max() / np.abs(r).max() < 6.5e-8


def test_sharded_hr_health_and_guard(rng, monkeypatch):
    """The distributed hr path carries the same breakdown monitor as the
    single-chip one: healthy inputs report a tiny replicated scalar and no
    warning; a near-duplicate-column input trips the qr_sharded guard and
    ROUTES to the stable Householder sharded driver. The fast tier pins the
    routing with a stubbed fallback target (the real hh sharded rerun was
    the single heaviest fast-suite item three rounds running, 54.8 s —
    VERDICT r4 next-#6); the healthy guard-silent end-to-end arm and the
    full fallback end-to-end, Gram-identity verification included, are the
    slow twins below."""
    from tileqr.drivers.sharded_hr import qr_sharded_factor_hr

    mesh = jax.make_mesh((2, 1), ("rows", "cols"))
    cfg = QRConfig(nb=16, mesh_shape=(2, 1), square_method="hr")
    a = rng.standard_normal((48, 32)).astype(np.float32)
    f = qr_sharded_factor_hr(a, mesh, cfg)
    assert float(f.health) < 1e-3

    # trip arm (routing only): stub the hh sharded factor target — the
    # guard decision + warning + reroute happen before it runs
    import tileqr.drivers.sharded as sharded_mod

    sentinel = object()
    called = {}

    def stub(a_, mesh_, cfg_):
        called["yes"] = True
        return sentinel

    monkeypatch.setattr(sharded_mod, "qr_sharded_factor", stub)
    b = a.copy()
    b[:, 1] = b[:, 0] * (1 + 1e-7)
    with pytest.warns(UserWarning, match="hr guard"):
        fb = qr_sharded(b, mesh, cfg, mode="factor")
    assert called.get("yes") and fb is sentinel


@pytest.mark.slow
def test_sharded_hr_healthy_guard_silent(rng):
    """Slow twin of the healthy arm: a well-conditioned input runs the full
    qr_sharded hr route with warnings-as-errors (the guard must stay
    silent) and R matches numpy."""
    import warnings

    mesh = jax.make_mesh((2, 1), ("rows", "cols"))
    cfg = QRConfig(nb=16, mesh_shape=(2, 1), square_method="hr")
    a = rng.standard_normal((64, 48)).astype(np.float32)
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        r = qr_sharded(a, mesh, cfg)
    assert np.allclose(
        np.abs(np.asarray(r)[:48]), np.abs(np.linalg.qr(a, mode="r")),
        atol=2e-4,
    )


@pytest.mark.slow
def test_sharded_hr_guard_fallback_end_to_end(rng):
    """Slow twin of the trip arm: the rerouted Householder sharded factors
    are real and R passes the conditioning-free Gram identity (forward
    error vs numpy is meaningless at cond ≈ 1e7 in fp32)."""
    mesh = jax.make_mesh((2, 1), ("rows", "cols"))
    cfg = QRConfig(nb=16, mesh_shape=(2, 1), square_method="hr")
    a = rng.standard_normal((64, 48)).astype(np.float32)
    b = a.copy()
    b[:, 1] = b[:, 0] * (1 + 1e-7)
    with pytest.warns(UserWarning, match="hr guard"):
        fb = qr_sharded(b, mesh, cfg, mode="factor")
    assert type(fb).__name__ != "ShardedHRFactors"
    from tileqr.drivers.sharded import assemble_r_sharded

    rb = assemble_r_sharded(fb)
    rb64 = np.asarray(rb, np.float64)[:48]
    assert np.isfinite(rb64).all()
    g_r = rb64.T @ rb64
    g_b = b.astype(np.float64).T @ b.astype(np.float64)
    assert np.linalg.norm(g_r - g_b) / np.linalg.norm(g_b) < 1e-5
