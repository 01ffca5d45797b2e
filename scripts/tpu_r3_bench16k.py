"""Round-3: verify the bench.py headline config end-to-end on the chip
(16384^2 static from cache + baseline), stepwise-logged."""
import sys, time

sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from tileqr.drivers.square import qr_tiled  # noqa: E402

N = int(sys.argv[1]) if len(sys.argv) > 1 else 16384


def flops(n):
    return 2 * n * n * (n - n / 3)


def sync(r):
    _ = np.asarray(jax.tree_util.tree_leaves(r)[0].ravel()[0])


def run_once(f, x):
    t0 = time.perf_counter()
    sync(f(x))
    return time.perf_counter() - t0


print("gen...", flush=True)
rng = np.random.default_rng(0)
a_h = rng.standard_normal((N, N)).astype(np.float32)
print("transfer...", flush=True)
t0 = time.perf_counter()
a = jnp.asarray(a_h)
sync(a)
print(f"transfer: {time.perf_counter()-t0:.1f} s", flush=True)


def mk(k):
    @jax.jit
    def f(x):
        for _ in range(k):
            x = qr_tiled(x, 256, chunk=4, precision="highest")[0]
        return x
    return f


t0 = time.perf_counter()
f1 = mk(1)
sync(f1(a))
print(f"first k=1 (compile?): {time.perf_counter()-t0:.1f} s", flush=True)
t0 = time.perf_counter()
f3 = mk(3)
sync(f3(a))
print(f"first k=3: {time.perf_counter()-t0:.1f} s", flush=True)

tk = min(run_once(f3, a) for _ in range(3))
t1 = min(run_once(f1, a) for _ in range(3))
t = (tk - t1) / 2
print(f"ours {N}^2: {t*1e3:.1f} ms  {flops(N)/t/1e12:.2f} TFLOP/s", flush=True)


def mkb(k):
    @jax.jit
    def f(x):
        for _ in range(k):
            q, r = jnp.linalg.qr(x)
            x = q + r * jnp.float32(1e-6)
        return x
    return f


b1, b3 = mkb(1), mkb(3)
sync(b1(a)); print("baseline k=1 ok", flush=True)
sync(b3(a))
tbk = min(run_once(b3, a) for _ in range(2))
tb1 = min(run_once(b1, a) for _ in range(2))
tb = (tbk - tb1) / 2
print(f"jnp.linalg.qr {N}^2: {tb*1e3:.1f} ms  -> speedup {tb/t:.2f}x", flush=True)
