"""Round-2: measure the slimmed GEQRT column loop (post-loop gram/doubling T
build) — square driver at 4096^2 / 8192^2, plus isolated panel-phase timing."""
import os
import sys

sys.path.insert(0, "/root/repo")
import numpy as np, time, jax, jax.numpy as jnp  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

rng = np.random.default_rng(0)


def flops(m, n):
    return 2 * n * n * (m - n / 3)


def sync(r):
    _ = np.asarray(jax.tree_util.tree_leaves(r)[0].ravel()[0])


def run_once(f, x):
    t0 = time.perf_counter()
    sync(f(x))
    return time.perf_counter() - t0


def chain_time(make, x, k, reps=3):
    fk, f1 = make(k), make(1)
    sync(fk(x))
    sync(f1(x))
    tk = min(run_once(fk, x) for _ in range(reps))
    t1 = min(run_once(f1, x) for _ in range(reps))
    return (tk - t1) / (k - 1)


from tileqr.drivers.square import qr_tiled, assemble_r, apply_q_tiled  # noqa: E402
from tileqr.kernels.panel import panel_factor  # noqa: E402
from tileqr.kernels.chain import panel_chain  # noqa: E402

NB, CH = 256, 4

# --- isolated panel phase: panel_factor + panel_chain at 8192-row column ---
a = jnp.asarray(rng.standard_normal((8192, 8192)).astype(np.float32))


def mk_panel(k):
    @jax.jit
    def f(x):
        for _ in range(k):
            # k=0 panel of a 32-tile column: GEQRT + 7 chunk couples
            r, v, tg, t2 = panel_factor(x, 0, NB, n_couples=3)
            r2, vc, t2t = panel_chain(x, r, 0, NB, 1, 7, CH * NB)
            x = x + r2[0, 0] * jnp.float32(1e-12)
        return x

    return f


t = chain_time(mk_panel, a, 4, reps=3)
print(f"panel phase (GEQRT+3 head+7 chunk couples, nb=256): {t*1e3:.2f} ms", flush=True)

# --- full 4096^2 ---
a4 = jnp.asarray(rng.standard_normal((4096, 4096)).astype(np.float32))


def mk4(k):
    @jax.jit
    def f(x):
        for _ in range(k):
            x = qr_tiled(x, NB, chunk=CH)[0]
        return x

    return f


t4 = chain_time(mk4, a4, 3)
print(f"4096^2 (nb=256, c=4): {t4*1e3:.2f} ms  {flops(4096,4096)/t4/1e12:.2f} TFLOP/s", flush=True)

# residual check at 4096^2
packed, rd, tg, panels = qr_tiled(a4, NB, chunk=CH)
r = assemble_r(packed, rd, NB)
qta = apply_q_tiled(panels, tg, a4, NB, chunk=CH, trans=True)
relerr = float(jnp.linalg.norm(qta - r) / jnp.linalg.norm(a4))
print(f"4096^2 |QtA-R|/|A| = {relerr:.2e}", flush=True)
del a4, packed, rd, tg, panels, r, qta

# --- full 8192^2 ---
def mk8(k):
    @jax.jit
    def f(x):
        for _ in range(k):
            x = qr_tiled(x, NB, chunk=CH)[0]
        return x

    return f


t8 = chain_time(mk8, a, 3)
print(f"8192^2 (nb=256, c=4): {t8*1e3:.2f} ms  {flops(8192,8192)/t8/1e12:.2f} TFLOP/s", flush=True)
