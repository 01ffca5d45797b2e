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

for size, reps in [(4096, 3), (8192, 2)]:
    a = jnp.asarray(rng.standard_normal((size, size)).astype(np.float32))
    fk, f1 = make_chain(reps, 256, 4, "highest"), make_chain(1, 256, 4, "highest")
    sync(fk(a)); sync(f1(a))
    tk = min(run_once(fk, a) for _ in range(3)); t1 = min(run_once(f1, a) for _ in range(3))
    per = (tk - t1) / (reps - 1) if reps > 1 else tk - t1
    out = qr_tiled(a, 256, chunk=4)
    r = np.asarray(assemble_r(out[0], out[1], 256)).astype(np.float64)
    qta = np.asarray(apply_q_tiled(out[3], out[2], a, 256, chunk=4, trans=True)).astype(np.float64)
    rel = np.linalg.norm(qta - r) / np.linalg.norm(np.asarray(a))
    print(f"{size} chunk=4 no-dup-alias: {per*1e3:.2f} ms  {flops(size,size)/per/1e12:.2f} TFLOP/s  relerr={rel:.2e}", flush=True)
print("DONE", flush=True)
