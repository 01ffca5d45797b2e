"""Public API stubs — filled in as drivers land (build plan SURVEY.md §7.1)."""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class QRFactors(NamedTuple):
    """Packed tiled-QR factors (layout documented in ref/blocked_qr.py)."""

    packed: jnp.ndarray
    t_geqrt: jnp.ndarray
    t_tsqrt: jnp.ndarray
    nb: int
    shape: tuple


def _nyi(name):
    def f(*a, **k):
        raise NotImplementedError(f"tileqr.{name} lands later in the build plan")

    f.__name__ = name
    return f


qr = _nyi("qr")
qr_factor = _nyi("qr_factor")
tsqr = _nyi("tsqr")
qr_batched = _nyi("qr_batched")
orgqr = _nyi("orgqr")
apply_q = _nyi("apply_q")
lstsq = _nyi("lstsq")
