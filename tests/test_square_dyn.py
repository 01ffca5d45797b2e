"""Bounded-compile dynamic driver (drivers/square_dyn.py): O(1) Mosaic
kernels + fori_loop over panels. One small config on the CPU interpret
backend (dynamic-grid interpret execution is slow); agreement with the
static driver's R and apply-Q round-trip are the gates."""

import jax.numpy as jnp
import numpy as np

from tileqr.drivers.square import assemble_r, qr_tiled
from tileqr.drivers.square_dyn import apply_q_tiled_dyn, qr_tiled_dyn


def test_dyn_matches_static_and_roundtrips(rng):
    # 3×3 panels: full + ragged couple stacks at chunk=2 — the minimum
    # geometry where the dynamic grid's couple indexing differs from a
    # single step (r5 fast-suite budget: 4×4 was ~1.7× the interpret cost
    # for no new code path)
    m = n = 96
    nb, ch = 32, 2
    a = jnp.asarray(rng.standard_normal((m, n)).astype(np.float32))

    a_dyn, f = qr_tiled_dyn(a, nb, ib=32, chunk=ch, interpret=True)
    r_dyn = np.triu(np.asarray(a_dyn))
    rd = np.asarray(f.r_diag)
    for k in range(n // nb):
        r_dyn[k * nb : (k + 1) * nb, k * nb : (k + 1) * nb] = np.triu(rd[k])

    packed, r_diag_s, _tg, _panels = qr_tiled(a, nb, ib=32, chunk=ch, interpret=True)
    r_static = np.asarray(assemble_r(packed, r_diag_s, nb))

    # same algebra, same couple order => same R up to fp noise from the
    # separated (non-fused) LARFB sweep
    assert np.linalg.norm(r_dyn - r_static) / np.linalg.norm(r_static) < 1e-5

    qta = np.asarray(apply_q_tiled_dyn(f, a, trans=True, interpret=True), np.float64)
    assert np.linalg.norm(qta - r_dyn) / np.linalg.norm(np.asarray(a)) < 1e-5

    c = jnp.asarray(rng.standard_normal((m, nb)).astype(np.float32))
    qtc = apply_q_tiled_dyn(f, c, trans=True, interpret=True)
    back = np.asarray(apply_q_tiled_dyn(f, qtc, trans=False, interpret=True), np.float64)
    assert np.linalg.norm(back - np.asarray(c)) / np.linalg.norm(np.asarray(c)) < 1e-5


def test_dyn_triangular_window_matches_full_apply(rng):
    """Dynamic twin of the xORGQR growing window: same executables (scalar
    column offsets + dynamic grids), bitwise-equal to the full sweep on an
    identity."""
    import jax.numpy as jnp
    import numpy as np

    from tileqr.drivers.square_dyn import apply_q_tiled_dyn, qr_tiled_dyn

    a = jnp.asarray(
        np.random.default_rng(0).standard_normal((256, 256)).astype(np.float32)
    )
    _, f = qr_tiled_dyn(a, 64, interpret=True)
    eye = jnp.eye(256, dtype=jnp.float32)
    full = np.asarray(apply_q_tiled_dyn(f, eye, trans=False, interpret=True))
    tri = np.asarray(
        apply_q_tiled_dyn(f, eye, trans=False, interpret=True, triangular=True)
    )
    assert (full == tri).all()
