import sys; sys.path.insert(0, "/root/repo")
import numpy as np, time, jax, jax.numpy as jnp
from tileqr.drivers.batched import geqrt_batched_vec
rng = np.random.default_rng(0)
def flops(m, n): return 2*n*n*(m - n/3)
def sync(r): _ = np.asarray(jax.tree_util.tree_leaves(r)[0].ravel()[0])
def run_once(f, x):
    t0 = time.perf_counter(); sync(f(x)); return time.perf_counter() - t0
b = jnp.asarray(rng.standard_normal((4096, 128, 128)).astype(np.float32))
def mk(k):
    @jax.jit
    def f(x):
        for _ in range(k):
            packed, t = geqrt_batched_vec(x)
            x = packed
        return x
    return f
fk, f1 = mk(3), mk(1)
sync(fk(b)); sync(f1(b))
tk = min(run_once(fk, b) for _ in range(3)); t1 = min(run_once(f1, b) for _ in range(3))
per = (tk - t1) / 2
print(f"batched-vec 4096x128^2: {per*1e3:.2f} ms  {4096*flops(128,128)/per/1e12:.2f} TFLOP/s", flush=True)
# correctness sample on TPU
from tileqr.drivers.batched import qr_batched
q, r = qr_batched(b)
i = 5
qi = np.asarray(q[i]).astype(np.float64); ri = np.asarray(r[i]).astype(np.float64)
bi = np.asarray(b[i]).astype(np.float64)
print(f"sample relerr={np.linalg.norm(bi - qi@ri)/np.linalg.norm(bi):.2e} orth={np.linalg.norm(qi.T@qi-np.eye(128)):.2e}", flush=True)
print("DONE", flush=True)
