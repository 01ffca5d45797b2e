"""API-level tests: qr / tsqr / qr_batched / orgqr / apply_q / lstsq through
the public package boundary, arbitrary (unpadded) shapes."""

import jax.numpy as jnp
import numpy as np
import pytest

import tileqr
from tileqr import QRConfig

CFG = QRConfig(nb=64)


def relerr(a, b):
    return np.linalg.norm(np.asarray(a, np.float64) - np.asarray(b, np.float64)) / np.linalg.norm(
        np.asarray(b, np.float64)
    )


@pytest.mark.parametrize("m,n", [(200, 200), (300, 100), (100, 40), (130, 130)])
def test_qr_reduced(rng, m, n):
    a = rng.standard_normal((m, n)).astype(np.float32)
    q, r = tileqr.qr(a, config=CFG)
    k = min(m, n)
    assert q.shape == (m, k) and r.shape == (k, n)
    q64, r64 = np.asarray(q, np.float64), np.asarray(r, np.float64)
    assert np.linalg.norm(a - q64 @ r64) / np.linalg.norm(a) < 3e-6
    assert np.linalg.norm(q64.T @ q64 - np.eye(k)) < 1e-4
    assert np.allclose(r64[np.tril_indices(k, -1)], 0) if n >= k else True


def test_qr_complete(rng):
    m, n = 160, 96
    a = rng.standard_normal((m, n)).astype(np.float32)
    q, r = tileqr.qr(a, mode="complete", config=CFG)
    assert q.shape == (m, m) and r.shape == (m, n)
    q64 = np.asarray(q, np.float64)
    assert np.linalg.norm(a - q64 @ np.asarray(r, np.float64)) / np.linalg.norm(a) < 3e-6
    assert np.linalg.norm(q64.T @ q64 - np.eye(m)) < 1e-4


def test_qr_r_mode_matches_numpy(rng):
    a = rng.standard_normal((192, 192)).astype(np.float32)
    r = np.asarray(tileqr.qr(a, mode="r", config=CFG), np.float64)
    _, r_np = np.linalg.qr(a.astype(np.float64))
    s = np.sign(np.diag(r_np)) * np.sign(np.diag(r))
    assert np.linalg.norm(r * s[:, None] - r_np) / np.linalg.norm(r_np) < 2e-5


def test_tsqr_matches_qr(rng):
    a = rng.standard_normal((1000, 48)).astype(np.float32)
    r = np.asarray(tileqr.tsqr(a, config=CFG), np.float64)
    _, r_np = np.linalg.qr(a.astype(np.float64))
    s = np.sign(np.diag(r_np)) * np.sign(np.diag(r))
    assert np.linalg.norm(r * s[:, None] - r_np) / np.linalg.norm(r_np) < 2e-5


def test_tsqr_reduced_q(rng):
    a = rng.standard_normal((640, 64)).astype(np.float32)
    q, r = tileqr.tsqr(a, mode="reduced", config=CFG)
    q64 = np.asarray(q, np.float64)
    assert q.shape == (640, 64)
    assert np.linalg.norm(a - q64 @ np.asarray(r, np.float64)) / np.linalg.norm(a) < 3e-6
    assert np.linalg.norm(q64.T @ q64 - np.eye(64)) < 1e-4


def test_qr_batched(rng):
    a = rng.standard_normal((8, 96, 64)).astype(np.float32)
    q, r = tileqr.qr_batched(a, config=CFG)
    assert q.shape == (8, 96, 64) and r.shape == (8, 64, 64)
    for i in range(8):
        qi = np.asarray(q[i], np.float64)
        assert np.linalg.norm(a[i] - qi @ np.asarray(r[i], np.float64)) / np.linalg.norm(a[i]) < 3e-6
        assert np.linalg.norm(qi.T @ qi - np.eye(64)) < 1e-4


def test_orgqr_apply_q_consistent(rng):
    m, n = 256, 128
    a = rng.standard_normal((m, n)).astype(np.float32)
    f = tileqr.qr_factor(a, CFG)
    q = tileqr.orgqr(f, config=CFG)
    c = rng.standard_normal((m, 32)).astype(np.float32)
    qc_direct = tileqr.apply_q(f, np.vstack([c[:n], np.zeros((m - n, 32), np.float32)]), config=CFG)
    qc_explicit = np.asarray(q) @ c[:n]
    assert relerr(qc_direct, qc_explicit) < 5e-5


@pytest.mark.parametrize("driver", ["static", "dynamic"])
def test_orgqr_reduced_ncols(rng, driver):
    """orgqr with ncols < min(M, N) (ADVICE r2: the static driver's
    growing-window slicing crashed on panels starting right of C's last
    column). The reduced columns must equal the full Q's leading columns —
    bitwise, since each column tile is computed by the same kernel grid
    steps regardless of the window width."""
    m, n = 64, 64
    a = rng.standard_normal((m, n)).astype(np.float32)
    f = tileqr.qr_factor(a, QRConfig(nb=16, driver=driver))
    q_full = np.asarray(tileqr.orgqr(f))
    # 8 (< nb) and 24 (not a tile multiple) cover the empty-window and
    # partial-tile cases; the full set ran once at 128^2/nb=32, trimmed to
    # 64^2/nb=16 for suite budget (same 4-panel structure)
    for ncols in (8, 24):
        q_k = np.asarray(tileqr.orgqr(f, ncols=ncols))
        assert q_k.shape == (m, ncols)
        assert (q_k == q_full[:, :ncols]).all()


def test_lstsq(rng):
    m, n = 300, 80
    a = rng.standard_normal((m, n)).astype(np.float32)
    x_true = rng.standard_normal((n,)).astype(np.float32)
    b = a @ x_true + 0.01 * rng.standard_normal((m,)).astype(np.float32)
    x = np.asarray(tileqr.lstsq(a, b, config=CFG), np.float64)
    x_np, *_ = np.linalg.lstsq(a.astype(np.float64), b.astype(np.float64), rcond=None)
    assert np.linalg.norm(x - x_np) / np.linalg.norm(x_np) < 1e-4
    # multi-RHS
    bm = rng.standard_normal((m, 3)).astype(np.float32)
    xm = np.asarray(tileqr.lstsq(a, bm, config=CFG), np.float64)
    xm_np, *_ = np.linalg.lstsq(a.astype(np.float64), bm.astype(np.float64), rcond=None)
    assert np.linalg.norm(xm - xm_np) / np.linalg.norm(xm_np) < 1e-4


def test_wide_matrix(rng):
    m, n = 96, 200
    a = rng.standard_normal((m, n)).astype(np.float32)
    q, r = tileqr.qr(a, config=CFG)
    assert q.shape == (m, m) and r.shape == (m, n)
    assert relerr(np.asarray(q, np.float64) @ np.asarray(r, np.float64), a) < 3e-6


def test_tsqr_chain_matches_tree(rng):
    """Single-chip strategies agree on R up to column signs."""
    a = rng.standard_normal((1024, 48)).astype(np.float32)
    r_tree = np.asarray(tileqr.tsqr(a, config=CFG, strategy="tree"), np.float64)
    r_chain = np.asarray(tileqr.tsqr(a, config=CFG, strategy="chain"), np.float64)
    s = np.sign(np.diag(r_tree)) * np.sign(np.diag(r_chain))
    s[s == 0] = 1
    assert np.linalg.norm(r_chain * s[:, None] - r_tree) / np.linalg.norm(r_tree) < 2e-5


def test_qr_check_utility(rng):
    a = rng.standard_normal((150, 90)).astype(np.float32)
    q, r = tileqr.qr(a, config=CFG)
    m = tileqr.qr_check(a, q, r)
    assert m["relerr"] < 3e-6 and m["orth"] < 1e-4 and m["r_lower"] == 0.0


def test_relerr_streamed_matches_dense(rng):
    """The HBM-safe streamed full-width residual (utils/verify.py,
    VERDICT r3 missing-#1). Two gates: (a) the block-sum machinery is
    EXACT against host f64 when the apply is a fixed function (identity),
    including a ragged last block and K < M rows; (b) on real hh/hr
    factors it lands within 2× of the dense host residual (the apply's own
    rounding legitimately differs between a full-width and a blocked QᵀA —
    both are O(eps) estimates of the same backward error) and inside the
    acceptance gate."""
    m, n = 200, 160
    a = rng.standard_normal((m, n)).astype(np.float32)
    # (a) machinery exactness: apply = identity, r = top rows of a plus a
    # known perturbation → residual is computable exactly on host
    r_synth = np.asarray(a[:n]) + rng.standard_normal((n, n)).astype(np.float32) * 1e-5
    want = np.sqrt(
        np.linalg.norm(np.asarray(a[:n], np.float64) - np.asarray(r_synth, np.float64)) ** 2
        + np.linalg.norm(np.asarray(a[n:], np.float64)) ** 2
    ) / np.linalg.norm(np.asarray(a, np.float64))
    got = tileqr.relerr_streamed(lambda c: c, a, r_synth, col_block=48)
    assert abs(got - want) <= 1e-5 * want
    # (b) factor-level: both drivers, ragged col_block
    for cfg in (CFG, QRConfig(nb=64, square_method="hr")):
        f = tileqr.qr_factor(a, config=cfg)
        r = tileqr.qr(a, mode="r", config=cfg)
        qta = np.asarray(
            tileqr.apply_q(f, a, trans=True, config=cfg), np.float64
        )
        r_pad = np.zeros((m, n))
        r_pad[: r.shape[0]] = np.asarray(r, np.float64)
        dense = np.linalg.norm(qta - r_pad) / np.linalg.norm(a)
        streamed = tileqr.relerr_streamed(
            lambda c, f=f, cfg=cfg: tileqr.apply_q(f, c, trans=True, config=cfg),
            a, np.asarray(r), col_block=96,  # blocks 96, 64 — ragged tail
        )
        assert 0.5 * dense <= streamed <= 2.0 * dense
        assert streamed < 3e-6


def test_relerr_streamed_callable_a_matches_array(rng):
    """Callable-A mode (per-block regeneration) ≡ array-A mode BITWISE on
    identical data (VERDICT r4 weak-#2 / next-#5): the 32768² acceptance
    rows were produced through the callable form (PRNG block regeneration,
    scripts/r4_contract_requal.py) while the exactness test covered only
    the array form — an off-by-one in the block→key mapping would silently
    corrupt the acceptance numbers. Covers a ragged last block, K < M
    rows, and the r4 harness's exact fold_in(key, j0) regeneration
    pattern; also pins the denominator-before-apply donation-order
    contract (the apply here consumes/overwrites its input block)."""
    import jax

    m, n, k = 96, 80, 80
    key = jax.random.PRNGKey(7)

    def gen_blk(j0, j1):
        return jax.random.normal(
            jax.random.fold_in(key, j0), (m, j1 - j0), jnp.float32
        )

    col_block = 32  # blocks 32, 32, 16 — ragged tail
    a_full = jnp.concatenate(
        [gen_blk(j0, min(j0 + col_block, n)) for j0 in range(0, n, col_block)],
        axis=1,
    )
    r_synth = jnp.asarray(rng.standard_normal((k, n)).astype(np.float32))

    def apply_qt(c):
        # non-trivial, input-consuming apply stand-in: the donated-buffer
        # drivers overwrite their input, so the streamed harness must have
        # banked the denominator before calling this
        return jnp.flipud(c) * jnp.float32(1.5)

    got_arr = tileqr.relerr_streamed(apply_qt, a_full, r_synth, col_block=col_block)
    got_call = tileqr.relerr_streamed(
        apply_qt, gen_blk, r_synth, col_block=col_block, n_cols=n
    )
    assert got_call == got_arr  # bitwise: identical blocks, identical math
    with pytest.raises(ValueError, match="n_cols"):
        tileqr.relerr_streamed(apply_qt, gen_blk, r_synth, col_block=col_block)


def test_orth_streamed_matches_dense(rng):
    """Streamed orthogonality estimate (utils/verify.orth_streamed, VERDICT
    r4 missing-#3): (a) machinery check — a known non-orthogonal linear map
    Q (diagonal scaling) gives an estimate of ‖QᵀQ − I‖F within the
    gaussian-probe estimator's statistical spread; (b) on real hh and hr
    factors the estimate lands within 3× of the dense host ‖QᵀQ − I‖F from
    orgqr (and inside the acceptance class)."""
    from tileqr.utils.verify import orth_streamed

    m, n = 160, 128
    # (a) machinery: Q = diag(d) ⇒ ‖QᵀQ − I‖F known exactly
    d = jnp.asarray(1.0 + rng.standard_normal(m).astype(np.float32) * 1e-3)
    want = float(np.linalg.norm(np.asarray(d, np.float64) ** 2 - 1.0))
    got = orth_streamed(
        lambda c: c * d[:, None], lambda c: c * d[:, None], m,
        probes=512, block=128,
    )
    assert 0.6 * want <= got <= 1.6 * want
    # (b) factor-level, both square methods
    for cfg in (CFG, QRConfig(nb=64, square_method="hr")):
        a = rng.standard_normal((m, n)).astype(np.float32)
        f = tileqr.qr_factor(a, config=cfg)
        q = np.asarray(tileqr.orgqr(f, m, config=cfg), np.float64)
        dense = np.linalg.norm(q.T @ q - np.eye(m))
        est = orth_streamed(
            lambda c, f=f, cfg=cfg: tileqr.apply_q(f, c, config=cfg),
            lambda c, f=f, cfg=cfg: tileqr.apply_q(f, c, trans=True, config=cfg),
            m, probes=256, block=128,
        )
        # the streamed roundtrip includes the applies' own fp32 rounding;
        # both numbers are O(m·eps) — same class, loose factor
        assert est <= 3.0 * max(dense, 1e-6) and est < 1e-4


def test_qr_dynamic_driver_matches_static(rng):
    """QRConfig(driver="dynamic") routes qr/apply_q through the
    bounded-compile fori_loop driver (drivers/square_dyn.py); same tile
    algebra, so results agree with the static driver to fp32 reduction
    tolerance and pass the residual gate."""
    m, n = 256, 256
    a = rng.standard_normal((m, n)).astype(np.float32)
    dyn = QRConfig(nb=64, driver="dynamic")
    q, r = tileqr.qr(a, config=dyn)
    assert relerr(np.asarray(q, np.float64) @ np.asarray(r, np.float64), a) < 3e-6
    f = tileqr.qr_factor(a, config=dyn)
    qtb = tileqr.apply_q(f, a, trans=True, config=dyn)
    r_full = np.triu(np.asarray(tileqr.qr(a, mode="r", config=dyn)))
    assert relerr(np.asarray(qtb)[:n], r_full) < 3e-6


def test_qr_dynamic_donate(rng):
    """QRConfig(donate=True): the padded input buffer is donated to the
    dynamic factorization (the 32768²-on-one-chip HBM-fit knob); results
    are unchanged."""
    a = rng.standard_normal((128, 128)).astype(np.float32)
    q1, r1 = tileqr.qr(a, config=QRConfig(nb=64, driver="dynamic"))
    q2, r2 = tileqr.qr(a, config=QRConfig(nb=64, driver="dynamic", donate=True))
    assert (np.asarray(q1) == np.asarray(q2)).all()
    assert (np.asarray(r1) == np.asarray(r2)).all()


def test_qr_dynamic_driver_rectangular(rng):
    a = rng.standard_normal((320, 192)).astype(np.float32)
    dyn = QRConfig(nb=64, driver="dynamic")
    q, r = tileqr.qr(a, config=dyn)
    assert q.shape == (320, 192) and r.shape == (192, 192)
    assert relerr(np.asarray(q, np.float64) @ np.asarray(r, np.float64), a) < 3e-6


@pytest.mark.parametrize(
    "mk",
    [
        lambda rng: np.zeros((128, 128), np.float32),
        lambda rng: np.eye(128, dtype=np.float32),
        lambda rng: np.concatenate(
            [x := rng.standard_normal((128, 64)).astype(np.float32), x], axis=1
        ),
        lambda rng: rng.standard_normal((128, 1)).astype(np.float32),
    ],
    ids=["zero", "identity", "rank-deficient", "one-column"],
)
def test_qr_degenerate_inputs(rng, mk):
    """Degenerate inputs stay finite and satisfy A = QR with orthogonal Q
    (zero columns produce tau=0 identity reflectors, not NaNs)."""
    a = mk(rng)
    q, r = tileqr.qr(a, config=CFG)
    q64, r64 = np.asarray(q, np.float64), np.asarray(r, np.float64)
    assert np.isfinite(q64).all() and np.isfinite(r64).all()
    den = max(np.linalg.norm(a), 1.0)
    assert np.linalg.norm(q64 @ r64 - a) / den < 3e-6
    k = q64.shape[1]
    assert np.linalg.norm(q64.T @ q64 - np.eye(k)) < 1e-4


def test_prescale_extreme_magnitudes(rng):
    """QRConfig(prescale=True) lifts the fp32 input-magnitude limit
    (kernels/geqrt.py): entries ~1e20 overflow the unscaled column norm to
    inf, while the power-of-2 prescale path stays finite and accurate."""
    a = (rng.standard_normal((128, 96)) * 1e20).astype(np.float32)
    cfg_ps = QRConfig(nb=64, prescale=True)
    q, r = tileqr.qr(a, config=cfg_ps)
    q64, r64 = np.asarray(q, np.float64), np.asarray(r, np.float64)
    assert np.isfinite(q64).all() and np.isfinite(r64).all()
    assert relerr(q64 @ r64, a) < 3e-6
    # without prescale the same input overflows (documents the limit)
    q2, _ = tileqr.qr(a, config=QRConfig(nb=64))
    assert not np.isfinite(np.asarray(q2)).all()
    # lstsq through the prescale path
    x = tileqr.lstsq(a, a @ np.ones(96, np.float32), config=cfg_ps)
    assert np.allclose(np.asarray(x), 1.0, atol=1e-3)


def test_prescale_identity_on_moderate_data(rng):
    """Power-of-2 prescaling is exact: factors match the unscaled path
    bitwise on data that does not overflow (reflectors are scale-invariant
    and the division is lossless)."""
    a = rng.standard_normal((128, 128)).astype(np.float32)
    f0 = tileqr.qr_factor(a, config=QRConfig(nb=64))
    f1 = tileqr.qr_factor(a, config=QRConfig(nb=64, prescale=True))
    s = float(np.asarray(f1.scale))
    assert s == 2.0 ** np.round(np.log2(s))
    r0 = np.asarray(tileqr.qr(a, mode="r", config=QRConfig(nb=64)))
    r1 = np.asarray(tileqr.qr(a, mode="r", config=QRConfig(nb=64, prescale=True)))
    assert (r0 == r1).all()


def test_prescale_near_fp32_max(rng):
    """Review r2: amax > 2^127 must not overflow the scale computation
    (exp2(128) = inf) nor flush the reciprocal to a subnormal zero. The
    input keeps column norms below fp32 max so the true R is representable
    — beyond that no fp32 R exists for ANY algorithm."""
    n = 64
    a = (np.eye(n, dtype=np.float64) * 2.5e38
         + rng.standard_normal((n, n)) * 1e30).astype(np.float32)
    q, r = tileqr.qr(a, config=QRConfig(nb=64, prescale=True))
    q64, r64 = np.asarray(q, np.float64), np.asarray(r, np.float64)
    assert np.isfinite(q64).all() and np.isfinite(r64).all()
    assert relerr(q64 @ r64, a) < 3e-6


@pytest.mark.slow
def test_qr_shape_fuzz(rng):
    """Padding/edge fuzz: random (m, n, nb, chunk) combos through the public
    qr + residual gate — guards the pad/slice layer against shape rot."""
    for _ in range(12):
        m = int(rng.integers(1, 300))
        n = int(rng.integers(1, 300))
        nb = int(rng.choice([16, 32, 64, 128]))
        chunk = int(rng.choice([1, 2, 4]))
        a = rng.standard_normal((m, n)).astype(np.float32)
        q, r = tileqr.qr(a, config=QRConfig(nb=nb, chunk=chunk))
        k = min(m, n)
        assert q.shape == (m, k) and r.shape == (k, n)
        den = max(np.linalg.norm(a), 1.0)
        assert (
            np.linalg.norm(np.asarray(q, np.float64) @ np.asarray(r, np.float64) - a) / den
            < 5e-6
        ), (m, n, nb, chunk)


def test_driver_auto_policy():
    """driver="auto" (default) resolves to static for <= 32 panels and
    dynamic beyond, so a first qr() at 16384^2+ compiles in seconds."""
    cfg = QRConfig(nb=256)
    assert cfg.driver == "auto"
    assert cfg.resolve_driver(8192, 8192) == "static"
    assert cfg.resolve_driver(16384, 16384) == "dynamic"
    assert QRConfig(nb=256, driver="static").resolve_driver(16384, 16384) == "static"
    assert QRConfig(nb=64).resolve_driver(4096, 4096) == "dynamic"


def test_factors_are_jit_transparent(rng):
    """Factor objects pass through jit boundaries as ARGUMENTS (pytrees with
    static int fields). Closing over a factor instead bakes its arrays into
    the executable as constants — 3.6 GB of HLO at the 1048576x512 config,
    which broke remote compilation (review r2)."""
    import jax

    a = rng.standard_normal((192, 128)).astype(np.float32)

    f = tileqr.qr_factor(a, config=CFG)
    g = jax.jit(lambda fac, c: tileqr.apply_q(fac, c, trans=True, config=CFG))
    qta = g(f, a)
    r_full = np.triu(np.asarray(tileqr.qr(a, mode="r", config=CFG)))
    assert relerr(np.asarray(qta)[:128], r_full) < 3e-6

    fd = tileqr.qr_factor(a, config=QRConfig(nb=64, driver="dynamic"))
    qta_d = jax.jit(
        lambda fac, c: tileqr.apply_q(fac, c, trans=True, config=QRConfig(nb=64, driver="dynamic"))
    )(fd, a)
    assert relerr(np.asarray(qta_d)[:128], r_full) < 3e-6

    # strategy="tree" explicitly: the point here is the TSQRFactors pytree's
    # jit transparency (since r5, auto+factor routes to cholqr2 HRFactors —
    # covered by the hh/hr apply_q arms above and the routing test)
    ft = tileqr.tsqr(
        rng.standard_normal((1024, 48)).astype(np.float32), mode="factor",
        config=CFG, strategy="tree",
    )
    from tileqr.drivers.tsqr import tsqr_apply_q

    c = rng.standard_normal((ft.shape[0], 48)).astype(np.float32)
    out = jax.jit(lambda fac, cc: tsqr_apply_q(fac, cc, trans=True))(ft, jnp.asarray(c))
    top = np.asarray(out)[:48]
    assert np.isfinite(top).all()


def test_qr_batched_vec_fallback(rng):
    """Odd batch sizes (no power-of-2 group divisor) route through the
    batch-vectorized XLA path — same contract as the grouped kernel."""
    a = rng.standard_normal((5, 24, 16)).astype(np.float32)
    q, r = tileqr.qr_batched(a, config=CFG)
    assert q.shape == (5, 24, 16) and r.shape == (5, 16, 16)
    for i in range(5):
        qi = np.asarray(q[i], np.float64)
        assert np.linalg.norm(a[i] - qi @ np.asarray(r[i], np.float64)) / np.linalg.norm(a[i]) < 3e-6
        assert np.linalg.norm(qi.T @ qi - np.eye(16)) < 1e-4


def test_prescale_float64(rng):
    """Review r2b: the prescale exponent clamp is dtype-dependent — float64
    inputs with entries ~1e200 factor finitely (fp32's 127 clamp must not
    apply)."""
    a = (rng.standard_normal((96, 64)) * 1e200).astype(np.float64)
    cfg = QRConfig(nb=32, dtype=jnp.float64, prescale=True)
    q, r = tileqr.qr(a, config=cfg)
    q64, r64 = np.asarray(q), np.asarray(r)
    assert np.isfinite(q64).all() and np.isfinite(r64).all()
    # compute the residual on rescaled copies: ||a||^2 itself overflows f64
    d = q64 @ (r64 / 1e200) - a / 1e200
    assert np.linalg.norm(d) / np.linalg.norm(a / 1e200) < 1e-12


def test_qr_precision_b3(rng):
    """precision="b3" (manual bf16x3 fp32-emulated update matmuls): lands
    between "default" (~1e-2) and "highest" (~1e-7) — the 2-way bf16 split
    carries ~16 mantissa bits, measured ~1e-5 at 8192² on TPU
    (BASELINE.md r3). Both drivers accept the mode."""
    a = rng.standard_normal((128, 128)).astype(np.float32)
    for driver in ("static", "dynamic"):
        q, r = tileqr.qr(a, config=QRConfig(nb=64, precision="b3", driver=driver))
        q64, r64 = np.asarray(q, np.float64), np.asarray(r, np.float64)
        rel = np.linalg.norm(q64 @ r64 - a) / np.linalg.norm(a)
        assert 1e-8 < rel < 1e-4, rel
        assert np.linalg.norm(q64.T @ q64 - np.eye(128)) < 1e-2


def test_qr_bfloat16(rng):
    """bf16 end-to-end QR: kernels are dtype-generic with fp32 accumulation
    — backward error lands at bf16 resolution (~1e-2), documented capability
    rather than acceptance-grade accuracy."""
    a32 = rng.standard_normal((128, 96)).astype(np.float32)
    cfg = QRConfig(nb=64, dtype=jnp.bfloat16)
    q, r = tileqr.qr(a32, config=cfg)
    assert q.dtype == jnp.bfloat16 and r.dtype == jnp.bfloat16
    q64 = np.asarray(q, np.float64)
    r64 = np.asarray(r, np.float64)
    a_b = np.asarray(jnp.asarray(a32, jnp.bfloat16), np.float64)
    assert np.linalg.norm(q64 @ r64 - a_b) / np.linalg.norm(a_b) < 5e-2
    # Frobenius orthogonality scales as ~n·eps_bf16 = 96·2⁻⁸ ≈ 0.37 worst
    # case; with fp32 accumulation the measured value is 0.13. Gate at 2×
    # measured — far below the old vacuous 1.0 bound, and a real regression
    # (e.g. accumulation-dtype rot → bf16 partial sums) blows past it.
    assert np.linalg.norm(q64.T @ q64 - np.eye(96)) < 0.26


def test_public_export_surface(rng):
    """Every name in tileqr.__all__ resolves, and the factor pytree classes
    a user needs for isinstance routing (docs/API.md: qr_factor can return
    HRFactors; tsqr(mode="factor") returns TSQRFactors or HRFactors) are
    importable from the top-level namespace and are the classes the API
    actually returns."""
    for name in tileqr.__all__:
        assert getattr(tileqr, name, None) is not None, name

    a = rng.standard_normal((96, 64)).astype(np.float32)
    f = tileqr.qr_factor(a, QRConfig(nb=32))
    assert isinstance(f, (tileqr.QRFactors, tileqr.HRFactors))

    t = rng.standard_normal((512, 32)).astype(np.float32)
    ft = tileqr.tsqr(t, mode="factor", strategy="tree", config=QRConfig(nb=32))
    assert isinstance(ft, tileqr.TSQRFactors)


def test_input_validation_messages(rng):
    """Non-2-D and zero-size inputs raise clear errors at every public
    entry point instead of obscure unpack/stack failures deep in the
    drivers (r5 usability hardening)."""
    import re

    from tileqr.drivers.sharded import qr_sharded

    vec = np.ones(16, np.float32)
    stack = np.ones((2, 16, 16), np.float32)
    empty = np.ones((16, 0), np.float32)

    with pytest.raises(ValueError, match="2-D matrix"):
        tileqr.qr(vec)
    with pytest.raises(ValueError, match="qr_batched"):  # 3-D hint
        tileqr.qr(stack)
    with pytest.raises(ValueError, match="zero-size"):
        tileqr.qr(empty)
    with pytest.raises(ValueError, match="zero-size"):
        tileqr.qr(np.ones((0, 16), np.float32))
    with pytest.raises(ValueError, match="tsqr expects"):
        tileqr.tsqr(vec)
    with pytest.raises(ValueError, match=re.escape("(B, m, n)")):
        tileqr.qr_batched(np.ones((16, 16), np.float32))
    with pytest.raises(ValueError, match="lstsq expects"):
        tileqr.lstsq(vec, vec)
    with pytest.raises(ValueError, match=re.escape("(M,) or (M, P)")):
        tileqr.lstsq(np.eye(8, dtype=np.float32), np.ones((8, 1, 1), np.float32))
    with pytest.raises(ValueError, match="qr_sharded expects"):
        qr_sharded(vec)

    # int input is cast to the config dtype and factored correctly
    ai = (np.arange(256).reshape(16, 16) % 7).astype(np.int32)
    q, r = tileqr.qr(ai, config=QRConfig(nb=16))
    a64 = ai.astype(np.float64)
    assert q.dtype == np.float32
    assert (
        np.linalg.norm(a64 - np.asarray(q, np.float64) @ np.asarray(r, np.float64))
        / np.linalg.norm(a64)
        < 3e-6
    )
