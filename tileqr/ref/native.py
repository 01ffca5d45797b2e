"""ctypes binding to the native C++ CPU reference oracle (component C9).

The reference's correctness oracle is native C/C++ [SURVEY.md §2.1 C9];
native/qr_ref.cc is the equivalent here — a sequential Householder QR with
LAPACK xLARFG semantics and fixed reduction order, compiled with g++
(``make -C native``) and loaded via ctypes (no pybind11 in this image).
Builds on demand the first time it's requested; raises with a clear message
if no compiler is available.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_NATIVE_DIR = os.path.join(_REPO, "native")
_SO = os.path.join(_NATIVE_DIR, "libtileqr_ref.so")

_lib: Optional[ctypes.CDLL] = None


def _load() -> ctypes.CDLL:
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_SO):
        subprocess.run(["make", "-C", _NATIVE_DIR], check=True, capture_output=True)
    lib = ctypes.CDLL(_SO)
    for name, ct in [("f32", ctypes.c_float), ("f64", ctypes.c_double)]:
        fn = getattr(lib, f"tileqr_qr_{name}")
        fn.restype = None
        fn.argtypes = [
            ctypes.POINTER(ct), ctypes.c_int64, ctypes.c_int64, ctypes.POINTER(ct),
        ]
        g = getattr(lib, f"tileqr_geqrt_{name}")
        g.restype = None
        g.argtypes = [
            ctypes.POINTER(ct), ctypes.c_int64, ctypes.c_int64, ctypes.POINTER(ct),
        ]
    _lib = lib
    return lib


def available() -> bool:
    try:
        _load()
        return True
    except Exception:
        return False


def _ptr(a: np.ndarray):
    ct = ctypes.c_float if a.dtype == np.float32 else ctypes.c_double
    return a.ctypes.data_as(ctypes.POINTER(ct))


def qr_native(a: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Sequential Householder QR: returns (packed, tau) — R above the
    diagonal, v's below (LAPACK GEQRF layout)."""
    lib = _load()
    a = np.ascontiguousarray(a)
    if a.dtype not in (np.float32, np.float64):
        raise TypeError(f"unsupported dtype {a.dtype}")
    out = a.copy()
    m, n = out.shape
    tau = np.zeros(min(m, n), dtype=a.dtype)
    fn = lib.tileqr_qr_f32 if a.dtype == np.float32 else lib.tileqr_qr_f64
    fn(_ptr(out), m, n, _ptr(tau))
    return out, tau


def geqrt_native(a: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Single-tile GEQRT with compact-WY T — the native twin of
    ref/tile_ops.py::geqrt."""
    lib = _load()
    a = np.ascontiguousarray(a)
    out = a.copy()
    m, n = out.shape
    t = np.zeros((n, n), dtype=a.dtype)
    fn = lib.tileqr_geqrt_f32 if a.dtype == np.float32 else lib.tileqr_geqrt_f64
    fn(_ptr(out), m, n, _ptr(t))
    return out, t
