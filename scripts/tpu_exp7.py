import sys; sys.path.insert(0, "/root/repo")
import numpy as np, time, jax, jax.numpy as jnp
from tileqr.drivers.tsqr import tsqr_factor, tsqr_apply_q
from tileqr.drivers.batched import geqrt_batched, qr_batched

rng = np.random.default_rng(0)
def flops(m, n): return 2*n*n*(m - n/3)
def sync(r): _ = np.asarray(jax.tree_util.tree_leaves(r)[0].ravel()[0])
def run_once(f, x):
    t0 = time.perf_counter(); sync(f(x)); return time.perf_counter() - t0

# ---- config 3: 1048576 x 512 TSQR (nb=512) ----
m, n, nb = 1048576, 512, 512
a = jnp.asarray(rng.standard_normal((m, n)).astype(np.float32))
def mk_tsqr(k):
    @jax.jit
    def f(x):
        for _ in range(k):
            r = tsqr_factor(x, nb).r
            x = x + r[0, 0] * jnp.float32(1e-12)
        return x
    return f
fk, f1 = mk_tsqr(3), mk_tsqr(1)
sync(fk(a)); sync(f1(a))
tk = min(run_once(fk, a) for _ in range(3)); t1 = min(run_once(f1, a) for _ in range(3))
per = (tk - t1) / 2
print(f"TSQR 1048576x512 nb=512: {per*1e3:.2f} ms  {flops(m,n)/per/1e12:.2f} TFLOP/s", flush=True)

f = tsqr_factor(a, nb)
# relerr via Qt A = [R; 0]: compute norms on device
@jax.jit
def resid(a, r):
    qta = tsqr_apply_q(f, a, trans=True)
    top = qta[:n]
    dtop = jnp.linalg.norm(top - r)
    dbot = jnp.linalg.norm(qta[n:])
    return dtop, dbot, jnp.linalg.norm(a)
dtop, dbot, na = resid(a, f.r)
rel = float(jnp.sqrt(dtop**2 + dbot**2) / na)
print(f"TSQR relerr |QtA - [R;0]|/|A| = {rel:.2e}", flush=True)
# R vs numpy float32 (host)
an = np.asarray(a)
rn = np.linalg.qr(an, mode='r')
ro = np.asarray(f.r)
s = np.sign(np.diag(rn)) * np.sign(np.diag(ro)); s[s==0]=1
print(f"TSQR R vs numpy relerr = {np.linalg.norm(ro*s[:,None]-rn)/np.linalg.norm(rn):.2e}", flush=True)
del a, f, an, rn

# ---- config 4: 4096 batched 128^2 ----
b = jnp.asarray(rng.standard_normal((4096, 128, 128)).astype(np.float32))
def mk_b(k):
    @jax.jit
    def f(x):
        for _ in range(k):
            packed, t = geqrt_batched(x)
            x = packed
        return x
    return f
fk, f1 = mk_b(3), mk_b(1)
sync(fk(b)); sync(f1(b))
tk = min(run_once(fk, b) for _ in range(3)); t1 = min(run_once(f1, b) for _ in range(3))
per = (tk - t1) / 2
print(f"batched 4096x128^2: {per*1e3:.2f} ms  {4096*flops(128,128)/per/1e12:.2f} TFLOP/s", flush=True)
q, r = qr_batched(b)
i = 17
qi = np.asarray(q[i]).astype(np.float64); ri = np.asarray(r[i]).astype(np.float64)
bi = np.asarray(b[i]).astype(np.float64)
print(f"batched sample relerr={np.linalg.norm(bi - qi@ri)/np.linalg.norm(bi):.2e} orth={np.linalg.norm(qi.T@qi - np.eye(128)):.2e}", flush=True)
print("DONE", flush=True)
