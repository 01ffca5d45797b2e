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


for N in [int(x) for x in sys.argv[1:]] or [8192, 16384, 32768]:
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.standard_normal((N, N)).astype(np.float32))
    t0 = time.perf_counter()
    low = _qr_tiled_dyn_jit.lower(a, 256, 128, 4, "highest", False)
    t1 = time.perf_counter()
    low.compile()
    t2 = time.perf_counter()
    print(f"dyn {N}^2 ({N//256} panels): trace+lower {t1-t0:.1f} s, "
          f"compile {t2-t1:.1f} s", flush=True)

    best = 1e30
    for _ in range(3):
        tt0 = time.perf_counter()
        a_out, f = qr_tiled_dyn(a, 256, ib=128, chunk=4)
        sync(a_out)
        best = min(best, time.perf_counter() - tt0)
    print(f"dyn {N}^2 runtime (single-dispatch): {best*1e3:.1f} ms  "
          f"{flops(N)/best/1e12:.2f} TFLOP/s", flush=True)

    # residual on a 512-column slice (diag tiles 0..1 fixed from r_diag)
    nb, w = 256, 512
    c_slice = a[:, :w]
    qta = apply_q_tiled_dyn(f, c_slice, trans=True)
    r_cols = jnp.triu(a_out)[:, :w]
    rt = r_cols.reshape(N // nb, nb, w // nb, nb)
    idx = jnp.arange(w // nb)
    rt = rt.at[idx, :, idx, :].set(jax.vmap(jnp.triu)(f.r_diag[: w // nb]))
    r_cols = rt.reshape(N, w)
    num = np.linalg.norm(np.asarray(qta, np.float64) - np.asarray(r_cols, np.float64))
    den = np.linalg.norm(np.asarray(c_slice, np.float64))
    print(f"dyn {N}^2 |QtA-R|/|A| (512-col slice) = {num/den:.2e}", flush=True)
    del a, a_out, f, qta, r_cols, rt, c_slice
