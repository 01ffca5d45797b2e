"""Round-4 config-3 measurement (VERDICT r3 missing-#4 done-criterion):
tsqr(mode="factor", strategy="cholqr2") — whole-panel compact-WY factors at
CholeskyQR2 speed via modified-LU Householder reconstruction — vs the tree's
measured 230.5 ms factor + 101.9 ms apply (BASELINE.md config 3).

Methodology matches tpu_r2_tsqr.py: chained k=2 runs differenced against
k=1 to cancel the ~30 ms tunnel dispatch floor; factors passed as jit
ARGUMENTS (closing over them bakes GBs of constants into the HLO, r2 note).
"""
import sys
import time

sys.path.insert(0, "/root/repo")
import numpy as np  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import os  # noqa: E402

import tileqr  # noqa: E402
from tileqr.drivers.square_hr import apply_q_hr, hr_panel  # noqa: E402

M = int(os.environ.get("TSQR_M", "1048576"))
N = int(os.environ.get("TSQR_N", "512"))
INTERP = jax.default_backend() != "tpu"


def flops(m, n):
    return 2 * n * n * (m - n / 3)


def sync(r):
    _ = np.asarray(jax.tree_util.tree_leaves(r)[0].ravel()[0])


def run_once(f, *xs):
    t0 = time.perf_counter()
    sync(f(*xs))
    return time.perf_counter() - t0


def chain_time(make, reps, *xs):
    fk, f1 = make(2), make(1)
    sync(fk(*xs))
    sync(f1(*xs))
    tk = min(run_once(fk, *xs) for _ in range(reps))
    t1 = min(run_once(f1, *xs) for _ in range(reps))
    return tk - t1


rng = np.random.default_rng(0)
a = jnp.asarray(rng.standard_normal((M, N)).astype(np.float32))

# --- factor: cholqr2 route (hr_panel with nb = 512; stats on = shipping
# default, the guard monitor rides the gram the panel already computes) ---


def mk_factor(k):
    @jax.jit
    def f(x):
        out = None
        for _ in range(k):
            out = hr_panel(x, INTERP, stats=True)
            x = x + out[2][0, 0] * jnp.float32(1e-12)
        return out

    return f


t_f = chain_time(mk_factor, 3, a)
print(
    f"cholqr2 factor {M}x{N} (whole-panel Y,T,R): {t_f*1e3:.1f} ms  "
    f"{flops(M, N)/t_f/1e12:.2f} TFLOP/s   (tree: 230.5 ms)",
    flush=True,
)

# --- apply: Qᵀ onto an (M, 512) target through the public hr route ---
f = tileqr.tsqr(a, mode="factor", strategy="cholqr2")
c = jnp.asarray(rng.standard_normal((M, N)).astype(np.float32))


def mk_apply(k):
    @jax.jit
    def g(panels, x):
        for _ in range(k):
            y = apply_q_hr(panels, x, f.nb, trans=True)
            x = x + y[0, 0] * jnp.float32(1e-12)
        return y

    return g


t_a = chain_time(mk_apply, 3, f.panels, c)
print(
    f"cholqr2 apply Qt@(M,{N}): {t_a*1e3:.1f} ms   (tree apply: 101.9 ms)",
    flush=True,
)
print(
    f"factor+apply total: {(t_f+t_a)*1e3:.1f} ms vs tree 332.4 ms "
    f"({332.4/((t_f+t_a)*1e3):.2f}x)",
    flush=True,
)

# --- correctness: QᵀA top block vs R, tail norm, R vs numpy ---
qta = np.asarray(tileqr.apply_q(f, a, trans=True), np.float64)
r = np.asarray(f.r, np.float64)[:N, :N]
rel_top = np.linalg.norm(qta[:N] - r) / np.linalg.norm(np.asarray(a))
rel_tail = np.linalg.norm(qta[N:]) / np.linalg.norm(np.asarray(a))
rn = np.linalg.qr(np.asarray(a), mode="r").astype(np.float64)
s = np.sign(np.diag(rn)) * np.sign(np.diag(r))
s[s == 0] = 1
rel_r = np.linalg.norm(r * s[:, None] - rn) / np.linalg.norm(rn)
print(
    f"relerr: QtA-top {rel_top:.2e}  tail {rel_tail:.2e}  "
    f"R vs numpy {rel_r:.2e}",
    flush=True,
)
