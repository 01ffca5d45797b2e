"""Square-path tile-size probe: nb=512/chunk=2 vs nb=256/chunk=4 (same
couple height 1024, half the block boundaries, 512-wide MXU tiles in the
update sweep). VMEM estimate is borderline (~15-16 MB in couple_strip and
the chain kernel) — this measures whether it compiles and whether wider
tiles lift the ~60%-of-ceiling update efficiency."""
import sys, time

sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from tileqr.drivers.square import qr_tiled  # noqa: E402


def flops(n):
    return 2.0 * n * n * (n - n / 3.0)


def sync(r):
    _ = np.asarray(jax.tree_util.tree_leaves(r)[0].ravel()[0])


def run_once(f, x):
    t0 = time.perf_counter()
    sync(f(x))
    return time.perf_counter() - t0


def timeit(mk, x):
    fk, f1 = mk(3), mk(1)
    sync(fk(x)); sync(f1(x))
    tk = min(run_once(fk, x) for _ in range(4))
    t1 = min(run_once(f1, x) for _ in range(4))
    return (tk - t1) / 2


N = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
rng = np.random.default_rng(0)
a = jnp.asarray(rng.standard_normal((N, N)).astype(np.float32))

for nb, chunk, ib in [(512, 2, 128), (256, 4, 128), (512, 4, 128), (512, 2, 256)]:
    def mk(k, nb=nb, chunk=chunk, ib=ib):
        @jax.jit
        def f(x):
            for _ in range(k):
                x = qr_tiled(x, nb, ib=ib, chunk=chunk, precision="highest")[0]
            return x
        return f
    try:
        t = timeit(mk, a)
        print(f"{N}^2 nb={nb} c={chunk} ib={ib}: {t*1e3:.2f} ms  "
              f"{flops(N)/t/1e12:.2f} TFLOP/s", flush=True)
    except Exception as e:
        print(f"{N}^2 nb={nb} c={chunk} ib={ib}: FAIL {type(e).__name__}: "
              f"{str(e)[:200]}", flush=True)
