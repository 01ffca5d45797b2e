"""Round-3 experiment: hr R-diagonal anchor A/B (drivers/square_hr.py
r_anchor knob).

hr's 16384² backward error measured 1.16e-06 with R(k,k) taken from
CholeskyQR2's R (gram-accumulation error grows with panel height). The
"panel" anchor instead applies the reconstructed block reflector to the
panel's OWN columns and takes triu of the top block — the hh driver's way,
inheriting the backward stability of the HIGHEST reflector application.
Measures relerr + wall for both anchors at 8192²/16384²; if "panel" lands
under the ≤1e-6 gate at 16384², hr becomes acceptance-grade at its 84.6%
ceiling fraction.
"""
import sys, time

sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from tileqr.drivers.square_hr import apply_q_hr, qr_hr  # noqa: E402


def sync(r):
    _ = np.asarray(jax.tree_util.tree_leaves(r)[0].ravel()[0])


def run_once(f, x):
    t0 = time.perf_counter()
    sync(f(x))
    return time.perf_counter() - t0


def chained(make, x, k=3, reps=3):
    fk, f1 = make(k), make(1)
    sync(fk(x))
    sync(f1(x))
    tk = min(run_once(fk, x) for _ in range(reps))
    t1 = min(run_once(f1, x) for _ in range(reps))
    return (tk - t1) / (k - 1)


def qr_flops(n):
    return 2.0 * n * n * (n - n / 3.0)


def bench(n, nb, anchor, chain_k=3):
    a = jax.jit(
        lambda: jax.random.normal(jax.random.PRNGKey(0), (n, n), jnp.float32)
    )()
    sync(a)

    def mk(k):
        @jax.jit
        def f(x):
            for _ in range(k):
                r, panels = qr_hr(x, nb, interpret=False, r_anchor=anchor)
                x = x + r * jnp.float32(1e-30)
            return x

        return f

    t0 = time.perf_counter()
    f1 = mk(1)
    sync(f1(a))
    t_compile = time.perf_counter() - t0

    @jax.jit
    def resid(x):
        r, panels = qr_hr(x, nb, interpret=False, r_anchor=anchor)
        qr_prod = apply_q_hr(
            panels, r, nb, trans=False, precision="highest", interpret=False
        )
        num = jnp.linalg.norm((qr_prod - x).astype(jnp.float32))
        return num / jnp.linalg.norm(x)

    rel = float(resid(a))
    t = chained(mk, a, chain_k)
    print(
        f"hr {n}^2 nb={nb} anchor={anchor}: {t*1e3:.2f} ms "
        f"{qr_flops(n)/t/1e12:.2f} TFLOP/s  relerr {rel:.2e} "
        f"(compile+first {t_compile:.0f} s)",
        flush=True,
    )


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "8k"
    if which == "8k":
        bench(8192, 256, "panel")
        bench(8192, 256, "cholqr")
    elif which == "16k":
        bench(16384, 256, "panel", chain_k=2)
