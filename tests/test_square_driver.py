"""Integration tier (SURVEY.md §4): full tiled QR driver vs the L0 oracle —
tile-level agreement, reconstruction, orthogonality, determinism."""

import jax.numpy as jnp
import numpy as np
import pytest

from tileqr.drivers.square import apply_q_tiled, assemble_r, qr_tiled
from tileqr.ref import blocked_qr as refqr


def factor(a, nb, chunk=1):
    return qr_tiled(jnp.asarray(a), nb, chunk=chunk, interpret=True)


@pytest.mark.parametrize("m,n,nb", [(256, 256, 64), (384, 128, 64), (128, 256, 64)])
def test_r_matches_oracle(rng, m, n, nb):
    a = rng.standard_normal((m, n)).astype(np.float32)
    packed, r_diag, t_g, t_t = factor(a, nb)
    r = np.asarray(assemble_r(packed, r_diag, nb))
    pk_ref, _, _ = refqr.qr_tiled_ref(a, nb)
    r_ref = np.triu(pk_ref)
    assert np.linalg.norm(r - r_ref) / np.linalg.norm(r_ref) < 5e-6
    # V tiles (below-diagonal packed content) match the oracle too
    packed_np = np.asarray(packed)
    mt = m // nb
    for bi in range(1, mt):
        for bj in range(min(bi, n // nb)):
            got = packed_np[bi * nb : (bi + 1) * nb, bj * nb : (bj + 1) * nb]
            want = pk_ref[bi * nb : (bi + 1) * nb, bj * nb : (bj + 1) * nb]
            assert np.linalg.norm(got - want) / max(np.linalg.norm(want), 1e-20) < 5e-6


def test_reconstruction_and_orthogonality(rng):
    m = n = 256
    nb = 64
    a = rng.standard_normal((m, n)).astype(np.float32)
    packed, r_diag, t_g, t_t = factor(a, nb)
    r = np.asarray(assemble_r(packed, r_diag, nb)).astype(np.float64)
    q = np.asarray(
        apply_q_tiled(packed, t_g, t_t, np.eye(m, dtype=np.float32), nb,
                      chunk=1, trans=False, interpret=True)
    ).astype(np.float64)
    assert np.linalg.norm(a - q @ r) / np.linalg.norm(a) < 2e-6
    assert np.linalg.norm(q.T @ q - np.eye(m)) < 1e-4


def test_qt_then_q_roundtrip(rng):
    m, n, nb = 256, 128, 64
    a = rng.standard_normal((m, n)).astype(np.float32)
    packed, r_diag, t_g, t_t = factor(a, nb)
    c = rng.standard_normal((m, 64)).astype(np.float32)
    qtc = apply_q_tiled(packed, t_g, t_t, jnp.asarray(c), nb, chunk=1, trans=True, interpret=True)
    back = np.asarray(apply_q_tiled(packed, t_g, t_t, qtc, nb, chunk=1, trans=False, interpret=True))
    assert np.linalg.norm(back - c) / np.linalg.norm(c) < 5e-6


def test_chunked_reconstruction(rng):
    """chunk > 1 (tall couples) is a different, equally valid Householder
    factorization: verify reconstruction + orthogonality + R vs numpy."""
    m = n = 256
    nb = 64
    a = rng.standard_normal((m, n)).astype(np.float32)
    for chunk in (2, 4):
        packed, r_diag, t_g, t_t = qr_tiled(jnp.asarray(a), nb, chunk=chunk, interpret=True)
        r = np.asarray(assemble_r(packed, r_diag, nb)).astype(np.float64)
        q = np.asarray(
            apply_q_tiled(packed, t_g, t_t, np.eye(m, dtype=np.float32), nb,
                          chunk=chunk, trans=False, interpret=True)
        ).astype(np.float64)
        assert np.linalg.norm(a - q @ r) / np.linalg.norm(a) < 2e-6, chunk
        assert np.linalg.norm(q.T @ q - np.eye(m)) < 1e-4, chunk
        qta = np.asarray(
            apply_q_tiled(packed, t_g, t_t, jnp.asarray(a), nb,
                          chunk=chunk, trans=True, interpret=True)
        ).astype(np.float64)
        assert np.linalg.norm(qta - r) / np.linalg.norm(a) < 2e-6, chunk


def test_bitwise_determinism(rng):
    """BASELINE.json:5 'bitwise-stable tile outputs': same backend, same
    inputs → identical bits (doubles as a race detector, SURVEY.md §5)."""
    a = rng.standard_normal((256, 256)).astype(np.float32)
    out1 = factor(a, 64)
    out2 = factor(a, 64)
    import jax

    for x, y in zip(jax.tree_util.tree_leaves(out1), jax.tree_util.tree_leaves(out2)):
        assert (np.asarray(x) == np.asarray(y)).all()
