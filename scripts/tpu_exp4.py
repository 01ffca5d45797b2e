import sys; sys.path.insert(0, "/root/repo")
import numpy as np, time, jax, jax.numpy as jnp
from tileqr.drivers.square import qr_tiled, assemble_r, apply_q_tiled

rng = np.random.default_rng(0)
def flops(m, n): return 2*n*n*(m - n/3)
def sync(r): _ = np.asarray(jax.tree_util.tree_leaves(r)[0].ravel()[0])
def run_once(f, x):
    t0 = time.perf_counter(); sync(f(x)); return time.perf_counter() - t0

# chunk=5,6 at 4096 (VMEM probe), then 8192 at best chunk + jnp baseline
def make_chain(k, size, nb, chunk, prec):
    @jax.jit
    def f(a):
        for _ in range(k):
            a = qr_tiled(a, nb, chunk=chunk, precision=prec)[0]
        return a
    return f

a4 = jnp.asarray(rng.standard_normal((4096, 4096)).astype(np.float32))
best = 4
for chunk in [5, 6]:
    try:
        fk, f1 = make_chain(3, 4096, 256, chunk, "highest"), make_chain(1, 4096, 256, chunk, "highest")
        sync(fk(a4)); sync(f1(a4))
        tk = min(run_once(fk, a4) for _ in range(3)); t1 = min(run_once(f1, a4) for _ in range(3))
        per = (tk - t1) / 2
        print(f"4096 chunk={chunk}: {per*1e3:.2f} ms  {flops(4096,4096)/per/1e12:.2f} TFLOP/s", flush=True)
    except Exception as e:
        print(f"4096 chunk={chunk} FAILED ({'vmem' if 'vmem' in str(e) else type(e).__name__})", flush=True)

a8 = jnp.asarray(rng.standard_normal((8192, 8192)).astype(np.float32))
for chunk in [4]:
    fk, f1 = make_chain(2, 8192, 256, chunk, "highest"), make_chain(1, 8192, 256, chunk, "highest")
    sync(fk(a8)); sync(f1(a8))
    tk = min(run_once(fk, a8) for _ in range(3)); t1 = min(run_once(f1, a8) for _ in range(3))
    per = tk - t1
    print(f"8192 chunk={chunk}: {per*1e3:.2f} ms  {flops(8192,8192)/per/1e12:.2f} TFLOP/s", flush=True)
    out = qr_tiled(a8, 256, chunk=chunk)
    r = np.asarray(assemble_r(out[0], out[1], 256)).astype(np.float64)
    qta = np.asarray(apply_q_tiled(out[0], out[2], out[3], a8, 256, chunk=chunk, trans=True)).astype(np.float64)
    print(f"8192 relerr={np.linalg.norm(qta - r)/np.linalg.norm(np.asarray(a8)):.2e}", flush=True)

def make_base(k):
    @jax.jit
    def f(x):
        for _ in range(k):
            q, r = jnp.linalg.qr(x)
            x = q + r * jnp.float32(1e-6)
        return x
    return f
fk, f1 = make_base(2), make_base(1)
sync(fk(a8)); sync(f1(a8))
tk = min(run_once(fk, a8) for _ in range(3)); t1 = min(run_once(f1, a8) for _ in range(3))
print(f"jnp.linalg.qr 8192: {(tk-t1)*1e3:.2f} ms  {flops(8192,8192)/(tk-t1)/1e12:.2f} TFLOP/s", flush=True)
print("DONE", flush=True)
