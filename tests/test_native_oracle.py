"""Native C++ oracle (component C9) vs the numpy oracle and numpy.linalg."""

import numpy as np
import pytest

from tileqr.ref import native
from tileqr.ref import tile_ops as ops

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native oracle not built (no g++?)"
)


@pytest.mark.parametrize("dtype,tol", [(np.float32, 5e-6), (np.float64, 1e-13)])
def test_geqrt_native_matches_numpy_oracle(rng, dtype, tol):
    a = rng.standard_normal((96, 64)).astype(dtype)
    pk_n, t_n = native.geqrt_native(a)
    pk_py, t_py = ops.geqrt(a)
    assert np.linalg.norm(pk_n - pk_py) / np.linalg.norm(pk_py) < tol
    assert np.linalg.norm(t_n - t_py) / np.linalg.norm(t_py) < tol


def test_qr_native_r_matches_numpy(rng):
    a = rng.standard_normal((128, 96))
    packed, tau = native.qr_native(a)
    r = np.triu(packed)[:96]
    _, r_np = np.linalg.qr(a)
    s = np.sign(np.diag(r_np)) * np.sign(np.diag(r))
    s[s == 0] = 1
    assert np.linalg.norm(r * s[:, None] - r_np) / np.linalg.norm(r_np) < 1e-12


def test_native_deterministic(rng):
    a = rng.standard_normal((64, 64)).astype(np.float32)
    p1, t1 = native.qr_native(a)
    p2, t2 = native.qr_native(a)
    assert (p1 == p2).all() and (t1 == t2).all()
