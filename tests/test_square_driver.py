"""Integration tier (SURVEY.md §4): full tiled QR driver vs the L0 oracle —
tile-level agreement, reconstruction, orthogonality, determinism."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tileqr.drivers.square import apply_q_tiled, assemble_r, qr_tiled
from tileqr.ref import blocked_qr as refqr


def factor(a, nb, chunk=1):
    return qr_tiled(jnp.asarray(a), nb, chunk=chunk, interpret=True)


@pytest.mark.parametrize(
    "m,n,nb",
    [
        # fast tier: square multi-panel (3×3), Mt>Nt, Nt>Mt — every tile-
        # grid orientation at the minimum panel counts that exercise the
        # full couple/update algebra; the 4×4 square case (~2.5× the
        # interpret cost of 3×3, no new code path) is the slow twin
        (192, 192, 64),
        (384, 128, 64),
        (128, 256, 64),
        pytest.param(256, 256, 64, marks=pytest.mark.slow),
    ],
)
def test_matches_oracle_tile_by_tile(rng, m, n, nb):
    """chunk=1 reproduces the reference flat-tree algebra: R and every
    reflector tile agree with the numpy oracle."""
    a = rng.standard_normal((m, n)).astype(np.float32)
    packed, r_diag, t_g, panels = factor(a, nb)
    r = np.asarray(assemble_r(packed, r_diag, nb))
    pk_ref, tg_ref, tt_ref = refqr.qr_tiled_ref(a, nb)
    r_ref = np.triu(pk_ref)
    assert np.linalg.norm(r - r_ref) / np.linalg.norm(r_ref) < 5e-6
    mt = m // nb
    k_max = min(mt, n // nb)
    for k in range(k_max):
        v_stack, t2h, v_chunks, t2t = panels[k]
        # GEQRT packed tile
        want = pk_ref[k * nb : (k + 1) * nb, k * nb : (k + 1) * nb]
        got = np.asarray(v_stack[0])
        # oracle keeps the final R in the diagonal tile; compare the V part
        assert np.linalg.norm(np.tril(got, -1) - np.tril(want, -1)) <= 2e-5 * max(
            np.linalg.norm(np.tril(want, -1)), 1e-6
        )
        # chunk=1: every sub-diagonal V2 tile is a v_chunks slot
        for i in range(mt - k - 1):
            want = pk_ref[(k + 1 + i) * nb : (k + 2 + i) * nb, k * nb : (k + 1) * nb]
            got = np.asarray(v_chunks[i, :, :])
            assert np.linalg.norm(got - want) / max(np.linalg.norm(want), 1e-20) < 2e-5
        assert np.linalg.norm(np.asarray(t_g[k]) - tg_ref[k]) / max(
            np.linalg.norm(tg_ref[k]), 1e-20
        ) < 2e-5


def test_reconstruction_and_orthogonality(rng):
    m = n = 256
    nb = 64
    a = rng.standard_normal((m, n)).astype(np.float32)
    packed, r_diag, t_g, panels = factor(a, nb)
    r = np.asarray(assemble_r(packed, r_diag, nb)).astype(np.float64)
    q = np.asarray(
        apply_q_tiled(panels, t_g, np.eye(m, dtype=np.float32), nb,
                      chunk=1, trans=False, interpret=True)
    ).astype(np.float64)
    assert np.linalg.norm(a - q @ r) / np.linalg.norm(a) < 2e-6
    assert np.linalg.norm(q.T @ q - np.eye(m)) < 1e-4


def test_qt_then_q_roundtrip(rng):
    m, n, nb = 192, 128, 64
    a = rng.standard_normal((m, n)).astype(np.float32)
    packed, r_diag, t_g, panels = factor(a, nb)
    c = rng.standard_normal((m, 64)).astype(np.float32)
    qtc = apply_q_tiled(panels, t_g, jnp.asarray(c), nb, chunk=1, trans=True, interpret=True)
    back = np.asarray(apply_q_tiled(panels, t_g, qtc, nb, chunk=1, trans=False, interpret=True))
    assert np.linalg.norm(back - c) / np.linalg.norm(c) < 5e-6


def _check_chunked_reconstruction(rng, m, n, nb, chunks):
    """chunk > 1 (tall couples) is a different, equally valid Householder
    factorization: verify reconstruction + orthogonality + QᵀA = R."""
    a = rng.standard_normal((m, n)).astype(np.float32)
    for chunk in chunks:
        packed, r_diag, t_g, panels = qr_tiled(jnp.asarray(a), nb, chunk=chunk, interpret=True)
        r = np.asarray(assemble_r(packed, r_diag, nb)).astype(np.float64)
        q = np.asarray(
            apply_q_tiled(panels, t_g, np.eye(m, dtype=np.float32), nb,
                          chunk=chunk, trans=False, interpret=True)
        ).astype(np.float64)
        assert np.linalg.norm(a - q @ r) / np.linalg.norm(a) < 2e-6, chunk
        assert np.linalg.norm(q.T @ q - np.eye(m)) < 1e-4, chunk
        qta = np.asarray(
            apply_q_tiled(panels, t_g, jnp.asarray(a), nb,
                          chunk=chunk, trans=True, interpret=True)
        ).astype(np.float64)
        assert np.linalg.norm(qta - r) / np.linalg.norm(a) < 2e-6, chunk


def test_chunked_reconstruction(rng):
    """Fast tier: chunk=2 at 3×3 panels sees both a FULL couple stack
    (k=0: two sub-diagonal tiles → one stack of 2) and a ragged tail
    (k=1: one tile) — the two chunked code paths. The 4×4/chunk=4
    geometry (all-ragged stacks, ~3× the interpret cost) is the slow
    twin below."""
    _check_chunked_reconstruction(rng, 192, 192, 64, (2,))


@pytest.mark.slow
def test_chunked_reconstruction_chunk4(rng):
    _check_chunked_reconstruction(rng, 256, 256, 64, (2, 4))


def test_bitwise_determinism(rng):
    """BASELINE.json:5 'bitwise-stable tile outputs': same backend, same
    inputs → identical bits (doubles as a race detector, SURVEY.md §5)."""
    a = rng.standard_normal((256, 256)).astype(np.float32)
    out1 = factor(a, 64, chunk=4)
    out2 = factor(a, 64, chunk=4)
    for x, y in zip(jax.tree_util.tree_leaves(out1), jax.tree_util.tree_leaves(out2)):
        assert (np.asarray(x) == np.asarray(y)).all()


def test_orgqr_triangular_window_matches_full_apply(rng):
    """apply_q_tiled(triangular=True) on an identity must equal the full
    sweep bitwise-closely: panel k's skipped column tiles < k are exact
    no-ops (W sums over all-zero rows), so the windowed result is the same
    computation minus provably-zero work."""
    import jax.numpy as jnp

    from tileqr.drivers.square import apply_q_tiled, qr_tiled

    a = jnp.asarray(rng.standard_normal((192, 192)).astype(np.float32))
    _, _, tg, panels = qr_tiled(a, 64, interpret=True)
    eye = jnp.eye(192, dtype=jnp.float32)
    full = np.asarray(
        apply_q_tiled(panels, tg, eye, 64, trans=False, interpret=True)
    )
    tri = np.asarray(
        apply_q_tiled(panels, tg, eye, 64, trans=False, interpret=True, triangular=True)
    )
    assert (full == tri).all()
