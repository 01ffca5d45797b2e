"""Round-3: cholqr2 phase split at config 4 (4096x128^2), CHAINED
differencing (the ~30 ms tunnel sync floor makes single-dispatch timings of
<50 ms workloads meaningless — the first cholqr sweep fell for it)."""
import sys, time

sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from tileqr.drivers.cholqr import (  # noqa: E402
    _bdot, _triu_inv_doubling, cholqr2_batched, potrf_batched,
    potrf_batched_xla)
from tileqr.drivers.batched import qr_batched  # noqa: E402


def sync(r):
    _ = np.asarray(jax.tree_util.tree_leaves(r)[0].ravel()[0])


def run_once(f, x):
    t0 = time.perf_counter()
    sync(f(x))
    return time.perf_counter() - t0


def chained(step, x, k=6, reps=3):
    """per-iter of a shape-preserving step via (T_k - T_1)/(k-1)."""
    def mk(kk):
        @jax.jit
        def f(y):
            for _ in range(kk):
                y = step(y)
            return y
        return f
    fk, f1 = mk(k), mk(1)
    sync(fk(x)); sync(f1(x))
    tk = min(run_once(fk, x) for _ in range(reps))
    t1 = min(run_once(f1, x) for _ in range(reps))
    return (tk - t1) / (k - 1)


B, M, N = 4096, 128, 128
a = jax.jit(lambda: jax.random.normal(jax.random.PRNGKey(0), (B, M, N), jnp.float32))()
sync(a)
hi = jax.lax.Precision.HIGHEST
lo = jax.lax.Precision.DEFAULT
dt = jnp.float32

# shape-preserving steps (output feeds next input)
t_mm_hi = chained(lambda x: _bdot(x, x, ((1,), (1,)), hi, dt) * jnp.float32(1e-2), a[:, :N, :])
print(f"(B,n,n)@(B,n,n) HIGHEST: {t_mm_hi*1e3:.2f} ms", flush=True)
t_mm_lo = chained(lambda x: _bdot(x, x, ((1,), (1,)), lo, dt) * jnp.float32(1e-2), a[:, :N, :])
print(f"(B,n,n)@(B,n,n) DEFAULT: {t_mm_lo*1e3:.2f} ms", flush=True)

g = jax.jit(lambda x: _bdot(x, x, ((1,), (1,)), hi, dt))(a)
sync(g)
# potrf chain: G -> R -> RtR (re-SPD); subtract one HIGHEST matmul
def potrf_step_xla(x):
    r = potrf_batched_xla(x)
    return _bdot(r, r, ((1,), (1,)), hi, dt)
t = chained(potrf_step_xla, g)
print(f"potrf_xla + regram: {t*1e3:.2f} ms  -> potrf_xla ~= {(t - t_mm_hi)*1e3:.2f} ms", flush=True)

def potrf_step_pl(x):
    r = potrf_batched(x, group=16, bp=16)
    return _bdot(r, r, ((1,), (1,)), hi, dt)
t = chained(potrf_step_pl, g)
print(f"potrf_pallas + regram: {t*1e3:.2f} ms  -> potrf_pallas ~= {(t - t_mm_hi)*1e3:.2f} ms", flush=True)

r1 = jax.jit(lambda x: potrf_batched_xla(x))(g); sync(r1)
t = chained(lambda x: _triu_inv_doubling(x, lo), r1)
print(f"triu inv doubling DEFAULT (chained on own output): {t*1e3:.2f} ms", flush=True)

# end-to-end: Q output has A's shape -> chain Q back in (orthonormal input
# is a legal, well-conditioned next input)
for impl in ("xla", "pallas"):
    t = chained(lambda x, impl=impl: cholqr2_batched(x, potrf_impl=impl)[0], a)
    print(f"cholqr2 end-to-end ({impl}): {t*1e3:.2f} ms", flush=True)

# reference: shipping grouped Householder (chain via Q)
t = chained(lambda x: qr_batched(x, mode="reduced")[0], a)
print(f"hh grouped qr_batched (chained): {t*1e3:.2f} ms", flush=True)

q, r = cholqr2_batched(a, potrf_impl="xla")
q64 = np.asarray(q, np.float64)[:64]
r64 = np.asarray(r, np.float64)[:64]
a64 = np.asarray(a, np.float64)[:64]
rel = max(np.linalg.norm(a64[i] - q64[i] @ r64[i]) / np.linalg.norm(a64[i]) for i in range(64))
orth = max(np.linalg.norm(q64[i].T @ q64[i] - np.eye(N)) for i in range(64))
print(f"cholqr2(xla) relerr {rel:.2e} orth {orth:.2e}", flush=True)
