import sys; sys.path.insert(0, "/root/repo")
import numpy as np, time, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from tileqr.drivers.square import qr_tiled
rng = np.random.default_rng(0)
def flops(m, n): return 2*n*n*(m - n/3)
def sync(r): _ = np.asarray(jax.tree_util.tree_leaves(r)[0].ravel()[0])
def run_once(f, x):
    t0 = time.perf_counter(); sync(f(x)); return time.perf_counter() - t0
a = jnp.asarray(rng.standard_normal((8192, 8192)).astype(np.float32))
for ib in [16, 32, 64]:
    def mk(k, ib=ib):
        @jax.jit
        def f(x):
            for _ in range(k):
                x = qr_tiled(x, 256, ib=ib, chunk=4)[0]
            return x
        return f
    fk, f1 = mk(2), mk(1)
    sync(fk(a)); sync(f1(a))
    tk = min(run_once(fk, a) for _ in range(3)); t1 = min(run_once(f1, a) for _ in range(3))
    per = tk - t1
    print(f"8192 ib={ib}: {per*1e3:.2f} ms  {flops(8192,8192)/per/1e12:.2f} TFLOP/s", flush=True)
print("DONE", flush=True)
