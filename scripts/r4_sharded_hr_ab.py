"""Round-4 A/B (VERDICT r3 next-#2 done-criterion): the distributed hr
update's split-K/pairwise local W projection (commit 106cc06,
sharded_hr._apply_panel_dist) vs the pre-fix single sequential fp32 dot, on
the 1×1 mesh at 8192²/16384².

Expectation: the post-fix residual lands in the single-chip post-fix error
class (~4-5e-07 — square_hr's split-K took 16384² static hr from 7.4e-07 to
4.41e-07) while the pre-fix branch shows the √m-grown value (8192² measured
6.5e-07 in r3); wall cost ≈ 0 (split-K was 2.7% single-chip).

Accuracy metric: FULL-WIDTH ‖QᵀA − [R;0]‖_F/‖A‖_F through
apply_q_sharded_hr(trans=True) — the factor's own backward error, no numpy
QR of a 16384² f64 matrix on the host. Timing: single-dispatch best-of-5
(~31 ms tunnel floor included, identical for both arms).

A/B mechanism: the pre-fix arm monkeypatches square_hr._W_PAIR_MAX_COLS to
-1 (narrow-pairwise branch dead) and square_hr._w_splitk to a plain
sequential dot — the update imports both per-call, so this reverts EXACTLY
the update's W accumulation (the panel grams keep their r3 pairwise form in
both arms; they are not part of the 106cc06 delta).
"""
import sys
import time

sys.path.insert(0, "/root/repo")
import numpy as np  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import tileqr.drivers.square_hr as square_hr_mod  # noqa: E402
from tileqr import QRConfig  # noqa: E402
from tileqr.drivers.sharded_hr import (  # noqa: E402
    apply_q_sharded_hr,
    assemble_r_sharded_hr,
    qr_sharded_factor_hr,
)


def sync(r):
    _ = np.asarray(jax.tree_util.tree_leaves(r)[0].ravel()[0])


def flops(n):
    return 2 * n * n * (n - n / 3)


def _seq_splitk(y, c, prec, dt, s=None):
    return jax.lax.dot_general(
        y, c, (((0,), (0,)), ((), ())), precision=prec,
        preferred_element_type=dt,
    )


import os  # noqa: E402

mesh = jax.make_mesh((1, 1), ("rows", "cols"))
NB = int(os.environ.get("AB_NB", "256"))
cfg = QRConfig(nb=NB, mesh_shape=(1, 1))
SEGMENTS = int(os.environ.get("AB_SEGMENTS", "8"))

orig = (square_hr_mod._w_splitk, square_hr_mod._W_PAIR_MAX_COLS)

for N in [int(s) for s in sys.argv[1:]] or [8192, 16384]:
    a = jax.jit(
        lambda N=N: jax.random.normal(jax.random.PRNGKey(0), (N, N), jnp.float32)
    )()
    sync(a)
    for arm in ["postfix", "prefix"]:
        if arm == "prefix":
            square_hr_mod._w_splitk = _seq_splitk
            square_hr_mod._W_PAIR_MAX_COLS = -1
        try:
            fac = jax.jit(
                lambda x: qr_sharded_factor_hr(
                    x, mesh=mesh, config=cfg, segments=SEGMENTS
                )
            )
            t0 = time.perf_counter()
            f = fac(a)
            sync(f.r_diag)
            print(
                f"[{arm}] {N}^2 1x1 first (compile+run): "
                f"{time.perf_counter()-t0:.1f} s",
                flush=True,
            )
            ts = []
            for _ in range(5):
                t0 = time.perf_counter()
                sync(fac(a).r_diag)
                ts.append(time.perf_counter() - t0)
            t = min(ts)
            r = np.asarray(assemble_r_sharded_hr(f, mesh), np.float64)
            qta = np.asarray(
                apply_q_sharded_hr(f, a, mesh, trans=True, config=cfg),
                np.float64,
            )
            k = r.shape[0]
            num = np.sqrt(
                np.linalg.norm(qta[:k] - r) ** 2 + np.linalg.norm(qta[k:]) ** 2
            )
            rel = num / np.linalg.norm(np.asarray(a, np.float64))
            print(
                f"[{arm}] {N}^2 1x1: {t*1e3:.2f} ms  "
                f"{flops(N)/t/1e12:.2f} TFLOP/s  full-width relerr {rel:.2e}",
                flush=True,
            )
        finally:
            square_hr_mod._w_splitk, square_hr_mod._W_PAIR_MAX_COLS = orig
