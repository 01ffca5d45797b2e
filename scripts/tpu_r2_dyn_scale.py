"""Dynamic-driver compile scaling + 32768^2 single-chip run (SURVEY §7.2-3).

At 32768^2 the wall clock is seconds, so the ~30 ms tunnel sync floor is
noise and single-dispatch timing is valid (no chained differencing needed).
"""
import sys, time

sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp  # noqa: E402

from tileqr.drivers.square_dyn import (  # noqa: E402
    _qr_tiled_dyn_jit,
    apply_q_tiled_dyn,
    qr_tiled_dyn,
)


def flops(n):
    return 2.0 * n * n * (n - n / 3.0)


def sync(r):
    _ = np.asarray(jax.tree_util.tree_leaves(r)[0].ravel()[0])


import functools  # noqa: E402

from tileqr.drivers.square_dyn import DynFactors  # noqa: E402
from tileqr.drivers.square import _chunk_for  # noqa: E402

# donating wrapper: at 32768^2 the carry buffers alone are ~11.5 GiB; holding
# the 4 GiB input alongside exceeds HBM, so the factor consumes its input
@functools.partial(jax.jit, donate_argnums=0)
def _factor_donating(a):
    return _qr_tiled_dyn_jit(a, 256, 128, 4, "highest", False)

for N in [int(x) for x in sys.argv[1:]] or [8192, 16384, 32768]:
    rng = np.random.default_rng(0)
    a_host = rng.standard_normal((N, N)).astype(np.float32)
    c_host = a_host[:, :512].copy()
    t0 = time.perf_counter()
    a = jnp.asarray(a_host)
    low = _qr_tiled_dyn_jit.lower(a, 256, 128, 4, "highest", False)
    t1 = time.perf_counter()
    low.compile()
    t2 = time.perf_counter()
    print(f"dyn {N}^2 ({N//256} panels): trace+lower {t1-t0:.1f} s, "
          f"compile {t2-t1:.1f} s", flush=True)

    best = 1e30
    out = None
    for _ in range(2):
        if out is not None:
            del out
        a = jnp.asarray(a_host)
        sync(a)
        tt0 = time.perf_counter()
        out = _factor_donating(a)
        sync(out[0])
        best = min(best, time.perf_counter() - tt0)
    a_out = out[0]
    c = _chunk_for(N // 256, 4)
    f = DynFactors(*out[1:], nb=256, chunk=c, shape=(N, N))
    print(f"dyn {N}^2 runtime (single-dispatch): {best*1e3:.1f} ms  "
          f"{flops(N)/best/1e12:.2f} TFLOP/s", flush=True)

    # residual on a 512-column slice (diag tiles 0..1 fixed from r_diag);
    # build R's slice WITHOUT materializing a full triu(a_out) copy
    nb, w = 256, 512
    c_slice = jnp.asarray(c_host)
    qta_h = np.asarray(apply_q_tiled_dyn(f, c_slice, trans=True), np.float64)
    s_h = np.asarray(a_out[:, :w], np.float64)
    r_diag_h = np.asarray(f.r_diag[: w // nb], np.float64)
    rows = np.arange(N)[:, None]
    cols = np.arange(w)[None, :]
    r_cols = np.where(rows <= cols, s_h, 0.0)
    for tb in range(w // nb):
        r_cols[tb * nb : (tb + 1) * nb, tb * nb : (tb + 1) * nb] = np.triu(r_diag_h[tb])
    num = np.linalg.norm(qta_h - r_cols)
    den = np.linalg.norm(c_host.astype(np.float64))
    print(f"dyn {N}^2 |QtA-R|/|A| (512-col slice) = {num/den:.2e}", flush=True)
    del a_out, f, out, c_slice
