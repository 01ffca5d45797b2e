"""Round-3 experiment (VERDICT r2 next-#2): manual bf16x3 fp32-emulated
matmul in the update bodies — isolated matmul roofline + full-QR accuracy
and speed through the dynamic driver (O(1) compile; relative comparisons
valid against its own HIGHEST run)."""
import sys, time

sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp  # noqa: E402

from tileqr.kernels.common import _dot_b3  # noqa: E402
from tileqr.drivers.square_dyn import _qr_tiled_dyn_jit, qr_tiled_dyn, apply_q_tiled_dyn  # noqa: E402


def sync(r):
    _ = np.asarray(jax.tree_util.tree_leaves(r)[0].ravel()[0])


def run_once(f, x):
    t0 = time.perf_counter()
    sync(f(x))
    return time.perf_counter() - t0


def chained(make, x, k=3, reps=4):
    fk, f1 = make(k), make(1)
    sync(fk(x)); sync(f1(x))
    tk = min(run_once(fk, x) for _ in range(reps))
    t1 = min(run_once(f1, x) for _ in range(reps))
    return (tk - t1) / (k - 1)


rng = np.random.default_rng(0)

# --- 1. isolated matmul roofline + error, 4096^3 ---
M = 4096
a = jnp.asarray(rng.standard_normal((M, M)).astype(np.float32))
dims = (((1,), (0,)), ((), ()))


def mk_b3(k):
    @jax.jit
    def f(x):
        for _ in range(k):
            x = _dot_b3(x, x, dims) * jnp.float32(1e-4)
        return x
    return f


def mk_prec(prec):
    def mk(k):
        @jax.jit
        def f(x):
            for _ in range(k):
                x = jnp.dot(x, x, precision=prec,
                            preferred_element_type=jnp.float32) * jnp.float32(1e-4)
            return x
        return f
    return mk


fl = 2 * M**3
t = chained(mk_b3, a, 5)
print(f"matmul b3      {M}^3: {t*1e3:.2f} ms  {fl/t/1e12:.1f} TFLOP/s", flush=True)
t = chained(mk_prec(jax.lax.Precision.HIGHEST), a, 5)
print(f"matmul HIGHEST {M}^3: {t*1e3:.2f} ms  {fl/t/1e12:.1f} TFLOP/s", flush=True)
t = chained(mk_prec(jax.lax.Precision.DEFAULT), a, 5)
print(f"matmul DEFAULT {M}^3: {t*1e3:.2f} ms  {fl/t/1e12:.1f} TFLOP/s", flush=True)

b = jnp.asarray(rng.standard_normal((M, M)).astype(np.float32))
ref = np.asarray(a, np.float64) @ np.asarray(b, np.float64)
for name, out in [
    ("b3", jax.jit(lambda x, y: _dot_b3(x, y, dims))(a, b)),
    ("HIGHEST", jnp.dot(a, b, precision=jax.lax.Precision.HIGHEST,
                        preferred_element_type=jnp.float32)),
    ("DEFAULT", jnp.dot(a, b, precision=jax.lax.Precision.DEFAULT,
                        preferred_element_type=jnp.float32)),
]:
    err = np.linalg.norm(np.asarray(out, np.float64) - ref) / np.linalg.norm(ref)
    print(f"matmul {name} relerr vs f64: {err:.2e}", flush=True)

# --- 2. full QR through the dynamic driver, 4096^2 and 8192^2 ---
def qr_flops(m, n):
    return 2 * n * n * (m - n / 3)


for N in ([4096, 8192] if len(sys.argv) < 2 else [int(sys.argv[1])]):
    x0 = jnp.asarray(rng.standard_normal((N, N)).astype(np.float32))
    for prec in ("highest", "b3"):
        def mk(k, prec=prec):
            @jax.jit
            def f(x):
                for _ in range(k):
                    x = _qr_tiled_dyn_jit(x, 256, 128, 4, prec, False)[0]
                return x
            return f

        t = chained(mk, x0, 3)
        print(f"dyn QR {N}^2 prec={prec}: {t*1e3:.2f} ms  "
              f"{qr_flops(N, N)/t/1e12:.2f} TFLOP/s", flush=True)

        a_out, f = qr_tiled_dyn(x0, 256, ib=128, chunk=4, precision=prec)
        nb = 256
        k_max = N // nb
        rt = jnp.triu(a_out).reshape(k_max, nb, k_max, nb)
        idx = jnp.arange(k_max)
        rt = rt.at[idx, :, idx, :].set(jax.vmap(jnp.triu)(f.r_diag))
        rfull = rt.reshape(N, N)
        qta = apply_q_tiled_dyn(f, x0, trans=True, precision=prec)
        num = np.linalg.norm(np.asarray(qta, np.float64) - np.asarray(rfull, np.float64))
        den = np.linalg.norm(np.asarray(x0, np.float64))
        print(f"dyn QR {N}^2 prec={prec}: |QtA-R|/|A| = {num/den:.2e}", flush=True)
