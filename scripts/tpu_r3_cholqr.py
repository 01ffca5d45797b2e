"""Round-3 (VERDICT r2 next-#6): batched CholeskyQR2 vs grouped Householder
at the config-4 shape (4096 x 128^2), real chip. On-device data generation
(tunnel transfer excluded)."""
import sys, time

sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from tileqr.drivers.cholqr import cholqr2_batched, potrf_batched  # noqa: E402
from tileqr.drivers.batched import qr_batched  # noqa: E402


def sync(r):
    _ = np.asarray(jax.tree_util.tree_leaves(r)[0].ravel()[0])


def run_once(f, x):
    t0 = time.perf_counter()
    sync(f(x))
    return time.perf_counter() - t0


B, M, N = 4096, 128, 128
a = jax.jit(lambda: jax.random.normal(jax.random.PRNGKey(0), (B, M, N), jnp.float32))()
sync(a)
print("data on device", flush=True)

fl = B * 2 * N * N * (M - N / 3)

# isolated potrf cost (gram precomputed)
g = jax.jit(lambda x: jnp.einsum("bij,bik->bjk", x, x,
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32))(a)
sync(g)
for grp in [16, 32, 64]:
    for bp in [8, 16, 32]:
        try:
            f = jax.jit(lambda x, grp=grp, bp=bp: potrf_batched(x, group=grp, bp=bp))
            sync(f(g))
            t = min(run_once(f, g) for _ in range(3))
            print(f"potrf g={grp} bp={bp}: {t*1e3:.2f} ms", flush=True)
        except Exception as ex:
            print(f"potrf g={grp} bp={bp}: FAIL {repr(ex)[:80]}", flush=True)

# end-to-end comparisons
for grp, bp in [(16, 16), (32, 16), (64, 16)]:
    try:
        f = jax.jit(lambda x, grp=grp, bp=bp: cholqr2_batched(x, group=grp, bp=bp))
        q, r = f(a); sync(q)
        t = min(run_once(f, a) for _ in range(3))
        print(f"cholqr2 g={grp} bp={bp}: {t*1e3:.2f} ms  {fl/t/1e12:.2f} TFLOP/s", flush=True)
    except Exception as ex:
        print(f"cholqr2 g={grp} bp={bp}: FAIL {repr(ex)[:80]}", flush=True)

# accuracy on hardware
q, r = cholqr2_batched(a, group=16, bp=16)
q64 = np.asarray(q, np.float64); r64 = np.asarray(r, np.float64)
a64 = np.asarray(a, np.float64)
rel = max(np.linalg.norm(a64[i] - q64[i] @ r64[i]) / np.linalg.norm(a64[i]) for i in range(0, B, 512))
orth = max(np.linalg.norm(q64[i].T @ q64[i] - np.eye(N)) for i in range(0, B, 512))
print(f"cholqr2 relerr {rel:.2e} orth {orth:.2e}", flush=True)

# reference: shipping grouped Householder path
fh = jax.jit(lambda x: qr_batched(x, mode="reduced"))
sync(fh(a)[0])
t = min(run_once(fh, a) for _ in range(3))
print(f"hh grouped qr_batched: {t*1e3:.2f} ms", flush=True)
