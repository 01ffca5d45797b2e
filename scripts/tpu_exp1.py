"""TPU experiment 1: nb=512 highest error detail; vreg column loop; timings."""
import sys; sys.path.insert(0, "/root/repo")
import numpy as np, time, jax, jax.numpy as jnp
from tileqr.drivers.square import qr_tiled, assemble_r, apply_q_tiled

rng = np.random.default_rng(0)
def flops(m, n): return 2*n*n*(m - n/3)
def sync(r): _ = np.asarray(jax.tree_util.tree_leaves(r)[0].ravel()[0])
def run_once(f, x):
    t0 = time.perf_counter(); sync(f(x)); return time.perf_counter() - t0

size = 4096
a = jnp.asarray(rng.standard_normal((size, size)).astype(np.float32))

# 1) nb=512 highest: which kernel fails?
from tileqr.kernels.panel import panel_factor
from tileqr.kernels.update import couple_apply
try:
    out = panel_factor(a, 0, 512)
    sync(out)
    print("panel nb=512 OK", flush=True)
    try:
        a2, row = couple_apply(out[0], out[2], out[3], out[0], 0, 1, 512)
        sync((a2,))
        print("update nb=512 OK", flush=True)
    except Exception as e:
        lines = [l for l in str(e).splitlines() if ('Mosaic' in l or 'implemented' in l or 'exceed' in l.lower() or 'vmem' in l.lower())]
        print("update nb=512 FAILED:", lines[:3], flush=True)
except Exception as e:
    lines = [l for l in str(e).splitlines() if ('Mosaic' in l or 'implemented' in l or 'exceed' in l.lower() or 'vmem' in l.lower())]
    print("panel nb=512 FAILED:", lines[:3], flush=True)

# 2) full driver timings (chain method)
def make_chain(k, nb, prec):
    @jax.jit
    def f(x):
        for _ in range(k):
            x = qr_tiled(x, nb, precision=prec)[0]
        return x
    return f

for nb, prec in [(512, "highest"), (384, "highest")]:
    try:
        fk, f1 = make_chain(3, nb, prec), make_chain(1, nb, prec)
        sync(fk(a)); sync(f1(a))
        tk = min(run_once(fk, a) for _ in range(3))
        t1 = min(run_once(f1, a) for _ in range(3))
        per = (tk - t1) / 2
        packed, r_diag, t_g, t_t = qr_tiled(a, nb, precision=prec)
        r = np.asarray(assemble_r(packed, r_diag, nb)).astype(np.float64)
        qta = np.asarray(apply_q_tiled(packed, t_g, t_t, a, nb, trans=True, precision=prec)).astype(np.float64)
        rel = np.linalg.norm(qta - r) / np.linalg.norm(np.asarray(a))
        print(f"qr_tiled nb={nb} {prec}: {per*1e3:.2f} ms  {flops(size,size)/per/1e12:.2f} TFLOP/s relerr={rel:.2e}", flush=True)
    except Exception as e:
        lines = [l for l in str(e).splitlines() if ('Mosaic' in l or 'implemented' in l)][:2]
        print(f"qr_tiled nb={nb} {prec} FAILED: {type(e).__name__} {lines}", flush=True)
print("DONE", flush=True)
