"""Round-2 north-star run: 8192^2 and 16384^2 with ib=128 + fused LARFB +
slim GEQRT, vs jnp.linalg.qr. Gate: >=20.3 TFLOP/s at 16384^2 (70% of the
29 TFLOP/s fp32-HIGHEST ceiling), relerr <= 1e-6."""
import sys

sys.path.insert(0, "/root/repo")
import numpy as np, time, jax, jax.numpy as jnp  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from tileqr.drivers.square import qr_tiled, assemble_r, apply_q_tiled  # noqa: E402


def flops(m, n):
    return 2 * n * n * (m - n / 3)


def sync(r):
    _ = np.asarray(jax.tree_util.tree_leaves(r)[0].ravel()[0])


def run_once(f, x):
    t0 = time.perf_counter()
    sync(f(x))
    return time.perf_counter() - t0


def chain_time(make, x, k, reps=4):
    fk, f1 = make(k), make(1)
    sync(fk(x))
    sync(f1(x))
    tk = min(run_once(fk, x) for _ in range(reps))
    t1 = min(run_once(f1, x) for _ in range(reps))
    return (tk - t1) / (k - 1)


rng = np.random.default_rng(0)

for N, reps, do_check in ((8192, 4, True), (16384, 3, True)):
    a = jnp.asarray(rng.standard_normal((N, N)).astype(np.float32))

    def mk(k):
        @jax.jit
        def f(x):
            for _ in range(k):
                x = qr_tiled(x, 256, chunk=4)[0]
            return x

        return f

    t = chain_time(mk, a, 3, reps=reps)
    print(f"{N}^2 (nb=256, c=4, ib=128): {t*1e3:.2f} ms  "
          f"{flops(N,N)/t/1e12:.2f} TFLOP/s", flush=True)

    def mkq(k):
        @jax.jit
        def f(x):
            for _ in range(k):
                q, r = jnp.linalg.qr(x)
                x = q + r * jnp.float32(1e-6)
            return x

        return f

    tb = chain_time(mkq, a, 3, reps=2)
    print(f"jnp.linalg.qr {N}^2: {tb*1e3:.2f} ms  {flops(N,N)/tb/1e12:.2f} TFLOP/s "
          f"-> ours {tb/t:.2f}x faster", flush=True)

    if do_check:
        packed, rd, tg, panels = qr_tiled(a, 256, chunk=4)
        r = assemble_r(packed, rd, 256)
        qta = apply_q_tiled(panels, tg, a, 256, trans=True)
        num = np.linalg.norm(np.asarray(qta, np.float64) - np.asarray(r, np.float64))
        den = np.linalg.norm(np.asarray(a, np.float64))
        print(f"{N}^2 |QtA-R|/|A| = {num/den:.2e}", flush=True)
        del packed, rd, tg, panels, r, qta
    del a
