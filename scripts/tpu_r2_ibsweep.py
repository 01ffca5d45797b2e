"""Round-2 ib sweep on the full square driver (post-loop T build changes the
ib tradeoff completely: block-boundary overheads now dominate, so bigger ib
should win — r1's flat 16/32/64 sweep predates this structure)."""
import sys

sys.path.insert(0, "/root/repo")
import numpy as np, time, jax, jax.numpy as jnp  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from tileqr.drivers.square import qr_tiled  # noqa: E402


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
N = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
a = jnp.asarray(rng.standard_normal((N, N)).astype(np.float32))

for ib in (64, 128, 256):
    def mk(k, ib=ib):
        @jax.jit
        def f(x):
            for _ in range(k):
                x = qr_tiled(x, 256, ib=ib, chunk=4)[0]
            return x

        return f

    t = chain_time(mk, a, 3)
    print(f"{N}^2 nb=256 c=4 ib={ib}: {t*1e3:.2f} ms  {flops(N,N)/t/1e12:.2f} TFLOP/s", flush=True)
