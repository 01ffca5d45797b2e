import sys; sys.path.insert(0, "/root/repo")
import numpy as np, time, jax, jax.numpy as jnp
from tileqr.drivers.batched import geqrt_batched_grouped
rng = np.random.default_rng(0)
def flops(m, n): return 2*n*n*(m - n/3)
def sync(r): _ = np.asarray(jax.tree_util.tree_leaves(r)[0].ravel()[0])
def run_once(f, x):
    t0 = time.perf_counter(); sync(f(x)); return time.perf_counter() - t0
b = jnp.asarray(rng.standard_normal((4096, 128, 128)).astype(np.float32))
for g in [8, 16, 32]:
    try:
        def mk(k, g=g):
            @jax.jit
            def f(x):
                for _ in range(k):
                    packed, t = geqrt_batched_grouped(x, group=g)
                    x = packed
                return x
            return f
        fk, f1 = mk(3), mk(1)
        sync(fk(b)); sync(f1(b))
        tk = min(run_once(fk, b) for _ in range(3)); t1 = min(run_once(f1, b) for _ in range(3))
        per = (tk - t1) / 2
        print(f"grouped g={g}: {per*1e3:.2f} ms  {4096*flops(128,128)/per/1e12:.2f} TFLOP/s", flush=True)
    except Exception as e:
        lines = [l for l in str(e).splitlines() if ('Mosaic' in l or 'vmem' in l.lower() or 'implemented' in l)][:1]
        print(f"grouped g={g} FAILED {type(e).__name__} {lines}", flush=True)
# correctness sample on TPU
packed, t = geqrt_batched_grouped(b, group=16)
from tileqr.ref import tile_ops as ops
i = 9
pr, tr = ops.geqrt(np.asarray(b[i]))
print(f"sample err={np.linalg.norm(np.asarray(packed[i])-pr)/np.linalg.norm(pr):.2e}", flush=True)
print("DONE", flush=True)
