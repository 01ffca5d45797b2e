"""Oracle-level tests: blocked tiled QR driver vs numpy (SURVEY.md §4).

Covers acceptance config 1 (BASELINE.json:7): a single 512×512 fp32 matrix,
one panel, on CPU, checked against numpy.linalg.qr.
"""

import numpy as np
import pytest

from tileqr.ref import blocked_qr as refqr

from tests.test_ref_tile_ops import sign_fix


def relerr(a, qr):
    return np.linalg.norm(a - qr) / np.linalg.norm(a)


@pytest.mark.parametrize("m,n,nb", [(128, 128, 32), (192, 128, 32), (256, 256, 64)])
def test_qr_tiled_ref_reconstructs(rng, m, n, nb):
    a = rng.standard_normal((m, n))
    q, r = refqr.qr_ref(a, nb)
    assert np.linalg.norm(q.T @ q - np.eye(m)) < 1e-12 * m
    assert relerr(a, q @ r) < 1e-12
    # R upper triangular with the convention R = triu(packed)
    assert np.allclose(r, np.triu(r))


def test_config1_512_one_panel_fp32(rng):
    """BASELINE.json:7 — 512² fp32, one panel (nb=512), vs numpy.linalg.qr."""
    a = rng.standard_normal((512, 512)).astype(np.float32)
    q, r = refqr.qr_ref(a, nb=512)
    q_np, r_np = np.linalg.qr(a.astype(np.float64))
    _, r_np = sign_fix(q_np, r_np)
    _, r_ours = sign_fix(np.eye(512), r.astype(np.float64))
    assert np.linalg.norm(r_ours - r_np) / np.linalg.norm(r_np) < 5e-4
    assert relerr(a.astype(np.float64), (q @ r).astype(np.float64)) < 1e-5
    assert np.linalg.norm(q.T @ q - np.eye(512)) < 1e-3


def test_config1_512_tiled_fp32(rng):
    """512² fp32 with 128² tiles — multi-tile flat-tree path on CPU."""
    a = rng.standard_normal((512, 512)).astype(np.float32)
    q, r = refqr.qr_ref(a, nb=128)
    assert relerr(a.astype(np.float64), (q @ r).astype(np.float64)) < 1e-5
    assert np.linalg.norm(q.T @ q - np.eye(512)) < 1e-3


def test_apply_q_roundtrip(rng):
    m, n, nb = 192, 128, 64
    a = rng.standard_normal((m, n))
    packed, t_g, t_t = refqr.qr_tiled_ref(a, nb)
    c = rng.standard_normal((m, 40))
    qc = refqr.apply_q_ref(packed, t_g, t_t, c, nb, trans=False)
    back = refqr.apply_q_ref(packed, t_g, t_t, qc, nb, trans=True)
    assert np.allclose(back, c, atol=1e-10)
    # Q^T A has R in the top block
    qta = refqr.apply_q_ref(packed, t_g, t_t, a, nb, trans=True)
    assert np.allclose(qta[:n], np.triu(packed)[:n], atol=1e-10)
    assert np.linalg.norm(qta[n:]) < 1e-9


@pytest.mark.parametrize("p_tiles", [2, 3, 8])
def test_tsqr_ref_matches_numpy(rng, p_tiles):
    nb, n = 64, 48
    a = rng.standard_normal((p_tiles * nb, n))
    r, _tree = refqr.tsqr_ref(a, nb)
    _, r_np = sign_fix(*np.linalg.qr(a))
    _, r_ours = sign_fix(np.eye(n), r)
    assert np.allclose(r_ours, r_np, atol=1e-10)
