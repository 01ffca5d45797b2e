"""Dynamic bounded-compile driver on TPU: compile time + runtime vs static."""
import sys, time

sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp  # noqa: E402

# NO persistent cache: we are measuring fresh compile cost
from tileqr.drivers.square_dyn import qr_tiled_dyn, apply_q_tiled_dyn, _qr_tiled_dyn_jit  # noqa: E402


def flops(m, n):
    return 2 * n * n * (m - n / 3)


def sync(r):
    _ = np.asarray(jax.tree_util.tree_leaves(r)[0].ravel()[0])


rng = np.random.default_rng(0)
N = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
a = jnp.asarray(rng.standard_normal((N, N)).astype(np.float32))

t0 = time.perf_counter()
low = _qr_tiled_dyn_jit.lower(a, 256, 128, 4, "highest", False)
t1 = time.perf_counter()
comp = low.compile()
t2 = time.perf_counter()
print(f"dyn {N}^2: trace+lower {t1-t0:.1f} s, compile {t2-t1:.1f} s", flush=True)

# runtime (chained differencing)
def mk(k):
    @jax.jit
    def f(x):
        for _ in range(k):
            x = _qr_tiled_dyn_jit(x, 256, 128, 4, "highest", False)[0]
        return x

    return f


def run_once(f, x):
    t0 = time.perf_counter()
    sync(f(x))
    return time.perf_counter() - t0


fk, f1 = mk(3), mk(1)
sync(fk(a)); sync(f1(a))
tk = min(run_once(fk, a) for _ in range(4))
t1r = min(run_once(f1, a) for _ in range(4))
t = (tk - t1r) / 2
print(f"dyn {N}^2 runtime: {t*1e3:.2f} ms  {flops(N,N)/t/1e12:.2f} TFLOP/s", flush=True)

# correctness on hardware
a_out, f = qr_tiled_dyn(a, 256, ib=128, chunk=4)
rfull = jnp.triu(a_out)
nb = 256
k_max = N // nb
rt = rfull.reshape(k_max, nb, k_max, nb)
idx = jnp.arange(k_max)
rt = rt.at[idx, :, idx, :].set(jax.vmap(jnp.triu)(f.r_diag))
rfull = rt.reshape(N, N)
qta = apply_q_tiled_dyn(f, a, trans=True)
num = np.linalg.norm(np.asarray(qta, np.float64) - np.asarray(rfull, np.float64))
den = np.linalg.norm(np.asarray(a, np.float64))
print(f"dyn {N}^2 |QtA-R|/|A| = {num/den:.2e}", flush=True)
