"""Kernel-tier unit tests (SURVEY.md §4): each Pallas kernel vs the L0 oracle
on random tiles, interpret mode on CPU (the Mosaic sanitizer path, §5)."""

import numpy as np
import pytest

from tileqr.kernels.geqrt import geqrt
from tileqr.kernels.larfb import larfb
from tileqr.kernels.ssrfb import ssrfb
from tileqr.kernels.tsqrt import tsqrt
from tileqr.kernels.ttqrt import ttqrt
from tileqr.ref import tile_ops as ops

TOL = 5e-6  # fp32 relative, kernel vs oracle (different reduction order)


def rel(got, want):
    got = np.asarray(got)
    den = np.linalg.norm(want)
    return np.linalg.norm(got - want) / (den if den > 0 else 1.0)


@pytest.mark.parametrize("m,n", [(128, 128), (256, 256), (192, 128), (128, 64)])
def test_geqrt_vs_oracle(rng, m, n):
    a = rng.standard_normal((m, n)).astype(np.float32)
    pk, t = geqrt(a)
    pk_ref, t_ref = ops.geqrt(a)
    assert rel(pk, pk_ref) < TOL
    assert rel(t, t_ref) < TOL


def test_geqrt_zero_tile():
    pk, t = geqrt(np.zeros((128, 64), np.float32))
    assert np.allclose(pk, 0) and np.allclose(t, 0)


def test_geqrt_deterministic(rng):
    a = rng.standard_normal((128, 128)).astype(np.float32)
    p1, t1 = geqrt(a)
    p2, t2 = geqrt(a)
    assert (np.asarray(p1) == np.asarray(p2)).all()
    assert (np.asarray(t1) == np.asarray(t2)).all()


def test_tsqrt_vs_oracle(rng):
    n, m = 128, 128
    r = np.triu(rng.standard_normal((n, n))).astype(np.float32)
    b = rng.standard_normal((m, n)).astype(np.float32)
    r1, v2, t2 = tsqrt(r, b)
    rr, vv, tt = ops.tsqrt(r, b)
    assert rel(r1, rr) < TOL and rel(v2, vv) < TOL and rel(t2, tt) < TOL
    # R' strictly-lower part must be exactly zero (structure preserved)
    assert np.allclose(np.tril(np.asarray(r1), -1), 0)


def test_ttqrt_structure(rng):
    n = 128
    r1 = np.triu(rng.standard_normal((n, n))).astype(np.float32)
    r2 = np.triu(rng.standard_normal((n, n))).astype(np.float32)
    ro, v2, t2 = ttqrt(r1, r2)
    rr, vv, tt = ops.ttqrt(r1, r2)
    assert rel(ro, rr) < TOL
    # TT structure: V2 upper-triangular exactly
    assert np.allclose(np.tril(np.asarray(v2), -1), 0)


@pytest.mark.parametrize("n", [128, 256])
def test_ttqrt_matches_tsqrt_bitwise(rng, n):
    """The lane-windowed TTQRT (kernels/ttqrt.py) must be BITWISE equal to
    the generic couple kernel on triangular inputs: the window only excludes
    lanes holding exact zeros, and fp sums over exact zeros are identities —
    this pins the structure exploitation as a pure cost optimization."""
    r1 = np.triu(rng.standard_normal((n, n))).astype(np.float32)
    r2 = np.triu(rng.standard_normal((n, n))).astype(np.float32)
    ro, v2, t2 = ttqrt(r1, r2)
    rg, vg, tg = tsqrt(r1, r2)
    assert (np.asarray(ro) == np.asarray(rg)).all()
    assert (np.asarray(v2) == np.asarray(vg)).all()
    assert (np.asarray(t2) == np.asarray(tg)).all()


def test_ttmqr_applies_tree_reflectors(rng):
    """TTMQR round-trip: factor [R1; R2], apply Qᵀ to the stacked couple —
    top must become R, and Q orthogonality transfers the Frobenius norm."""
    from tileqr.kernels.ttqrt import ttmqr

    n = 128
    r1 = np.triu(rng.standard_normal((n, n))).astype(np.float32)
    r2 = np.triu(rng.standard_normal((n, n))).astype(np.float32)
    ro, v2, t2 = ttqrt(r1, r2)
    top, bot = ttmqr(v2, t2, r1, r2, trans=True)
    assert rel(top, np.asarray(ro)) < TOL
    assert np.linalg.norm(np.asarray(bot)) < TOL * np.linalg.norm(np.asarray(ro))


@pytest.mark.parametrize("trans", [True, False])
def test_larfb_vs_oracle(rng, trans):
    m, n, p = 128, 128, 128
    a = rng.standard_normal((m, n)).astype(np.float32)
    c = rng.standard_normal((m, p)).astype(np.float32)
    pk, t = ops.geqrt(a)
    got = larfb(pk, t, c, trans=trans)
    want = ops.larfb(pk, t, c, trans=trans)
    assert rel(got, want) < TOL


@pytest.mark.parametrize("trans", [True, False])
def test_ssrfb_vs_oracle(rng, trans):
    n, m, p = 128, 128, 128
    r = np.triu(rng.standard_normal((n, n))).astype(np.float32)
    b = rng.standard_normal((m, n)).astype(np.float32)
    _, v2, t2 = ops.tsqrt(r, b)
    ct = rng.standard_normal((n, p)).astype(np.float32)
    cb = rng.standard_normal((m, p)).astype(np.float32)
    gt, gb = ssrfb(v2, t2, ct, cb, trans=trans)
    wt, wb = ops.ssrfb(v2, t2, ct, cb, trans=trans)
    assert rel(gt, wt) < TOL and rel(gb, wb) < TOL
