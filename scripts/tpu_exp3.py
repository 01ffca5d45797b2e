import sys; sys.path.insert(0, "/root/repo")
import numpy as np, time, jax, jax.numpy as jnp
from tileqr.drivers.square import qr_tiled, assemble_r, apply_q_tiled

rng = np.random.default_rng(0)
def flops(m, n): return 2*n*n*(m - n/3)
def sync(r): _ = np.asarray(jax.tree_util.tree_leaves(r)[0].ravel()[0])
def run_once(f, x):
    t0 = time.perf_counter(); sync(f(x)); return time.perf_counter() - t0
def make_chain(k, nb, chunk, prec):
    @jax.jit
    def f(a):
        for _ in range(k):
            a = qr_tiled(a, nb, chunk=chunk, precision=prec)[0]
        return a
    return f

size = 4096
a = jnp.asarray(rng.standard_normal((size, size)).astype(np.float32))
for chunk in [1, 2, 4, 8]:
    try:
        fk, f1 = make_chain(3, 256, chunk, "highest"), make_chain(1, 256, chunk, "highest")
        sync(fk(a)); sync(f1(a))
        tk = min(run_once(fk, a) for _ in range(3))
        t1 = min(run_once(f1, a) for _ in range(3))
        per = (tk - t1) / 2
        out = qr_tiled(a, 256, chunk=chunk)
        r = np.asarray(assemble_r(out[0], out[1], 256)).astype(np.float64)
        qta = np.asarray(apply_q_tiled(out[0], out[2], out[3], a, 256, chunk=chunk, trans=True)).astype(np.float64)
        rel = np.linalg.norm(qta - r) / np.linalg.norm(np.asarray(a))
        print(f"4096 chunk={chunk}: {per*1e3:7.2f} ms  {flops(size,size)/per/1e12:6.2f} TFLOP/s  relerr={rel:.2e}", flush=True)
    except Exception as e:
        lines = [l for l in str(e).splitlines() if ('Mosaic' in l or 'vmem' in l.lower() or 'implemented' in l or 'exceed' in l.lower())][:1]
        print(f"4096 chunk={chunk} FAILED {type(e).__name__} {lines}", flush=True)
print("DONE", flush=True)
