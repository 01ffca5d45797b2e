"""Round-3 experiment: CholeskyQR2 + Householder-reconstruction square
driver (square_method="hr", drivers/square_hr.py) on the real chip.

The r2 phase split (BASELINE.md) put the 8192² static driver at ~46.5 ms =
~21.9 ms updates (at the matmul ceiling) + ~24.6 ms latency-bound
Householder panel phase. hr replaces the panel column loops with
gram/POTRF/modified-LU (one nb×nb serial kernel per panel) + matmuls, so
the prediction is: panel phase collapses toward the update-phase time and
bigger nb gets FASTER (fewer, larger matmuls) instead of slower.

Measures, per (N, nb): compile time, chained per-iter wall, TFLOP/s, and an
on-device HIGHEST-precision residual (factor → apply_q(R-padded) → compare;
a DEFAULT-precision check matmul would add ~1e-3 of its own noise — the
documented verify gotcha)."""
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


def bench(n, nb, precision="highest", check=False, chain_k=3):
    a = jax.jit(
        lambda: jax.random.normal(jax.random.PRNGKey(0), (n, n), jnp.float32)
    )()
    sync(a)

    def mk(k):
        @jax.jit
        def f(x):
            for _ in range(k):
                r, panels = qr_hr(x, nb, precision=precision, interpret=False)
                # dependence without changing the input distribution
                x = x + r * jnp.float32(1e-30)
            return x

        return f

    t0 = time.perf_counter()
    f1 = mk(1)
    sync(f1(a))
    t_compile = time.perf_counter() - t0
    t = chained(mk, a, chain_k)
    tfl = qr_flops(n) / t / 1e12
    line = (
        f"hr {n}^2 nb={nb} {precision}: {t*1e3:.2f} ms  {tfl:.2f} TFLOP/s"
        f"  (compile+first {t_compile:.0f} s)"
    )
    if check:
        @jax.jit
        def resid(x):
            r, panels = qr_hr(x, nb, precision=precision, interpret=False)
            qr_prod = apply_q_hr(panels, r, nb, trans=False, precision="highest",
                                 interpret=False)
            num = jnp.linalg.norm((qr_prod - x).astype(jnp.float32))
            return num / jnp.linalg.norm(x)

        line += f"  relerr {float(resid(a)):.2e}"
    print(line, flush=True)
    return t


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "sweep"
    if which == "sweep":
        bench(4096, 256, check=True)
        bench(4096, 512, check=True)
        bench(8192, 256)
        bench(8192, 512, check=True)
        bench(8192, 1024)
    elif which == "sweep2":
        bench(4096, 128, check=True)
        bench(8192, 128, check=True)
        bench(8192, 256, check=True)
    elif which == "big":
        bench(16384, 256, check=True, chain_k=2)
    elif which == "big128":
        bench(16384, 128, check=True, chain_k=2)
    elif which == "b3":
        bench(8192, 256, precision="b3", check=True)
        bench(16384, 256, precision="b3", check=True, chain_k=2)
