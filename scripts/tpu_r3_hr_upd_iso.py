import sys, time
sys.path.insert(0, "/root/repo")  # isolated hr update precision sweep (BASELINE.md r3 b3 chain)
import numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from tileqr.drivers.square_hr import _apply_block_t
from tileqr.kernels.common import resolve_precision

def sync(x): _ = np.asarray(jax.lax.slice(x, (0,0), (1,1)))
def run_once(f, *a):
    t0 = time.perf_counter(); sync(f(*a)); return time.perf_counter() - t0
def chained(mk, *a, k=8):
    fk, f1 = mk(k), mk(1); sync(fk(*a)); sync(f1(*a))
    tk = min(run_once(fk, *a) for _ in range(3)); t1 = min(run_once(f1, *a) for _ in range(3))
    return (tk - t1) / (k - 1)

m, nb, n = 8192, 256, 8192
key = jax.random.PRNGKey
y = jax.jit(lambda: jax.random.normal(key(0), (m, nb), jnp.float32) * 0.1)()
t = jax.jit(lambda: jnp.triu(jax.random.normal(key(1), (nb, nb), jnp.float32) * 0.05))()
c = jax.jit(lambda: jax.random.normal(key(2), (m, n), jnp.float32))()
for x in (y, t, c): sync(x)
flops = 2*m*n*nb*2  # two big contractions
for pname in ("highest", "b3", "default"):
    prec = resolve_precision(pname)
    def mk(k, prec=prec):
        @jax.jit
        def f(y, t, c):
            for _ in range(k):
                c = _apply_block_t(y, t, c, prec, jnp.float32, True)
            return c
        return f
    tt = chained(mk, y, t, c)
    print(f"{pname:8s}: {tt*1e3:7.2f} ms  {flops/tt/1e12:6.2f} TFLOP/s", flush=True)

# Pallas panel_apply kernel variants (in-kernel split — the b3 fix)
from tileqr.kernels.panel_apply import panel_apply

for pname in ("highest", "b3"):
    def mk(k, pname=pname):
        @jax.jit
        def f(y, t, c):
            for _ in range(k):
                c = panel_apply(y, t, c, trans=True, precision=pname, interpret=False)
            return c
        return f
    tt = chained(mk, y, t, c)
    print(f"pallas {pname:8s}: {tt*1e3:7.2f} ms  {flops/tt/1e12:6.2f} TFLOP/s", flush=True)
