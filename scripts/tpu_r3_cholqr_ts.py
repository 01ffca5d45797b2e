"""Round-3: config-3 tall-skinny via CholeskyQR2 vs chain/tree (1048576x512)."""
import sys, time

sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from tileqr.drivers.cholqr import cholqr2_batched  # noqa: E402


def sync(r):
    _ = np.asarray(jax.tree_util.tree_leaves(r)[0].ravel()[0])


def run_once(f, x):
    t0 = time.perf_counter()
    sync(f(x))
    return time.perf_counter() - t0


M, N = 1048576, 512
fl = 2 * N * N * (M - N / 3)
a = jax.jit(lambda: jax.random.normal(jax.random.PRNGKey(0), (M, N), jnp.float32))()
sync(a)
print("data on device", flush=True)

fr = jax.jit(lambda x: cholqr2_batched(x[None], mode="r", group=1, bp=16))
sync(fr(a))
t = min(run_once(fr, a) for _ in range(3))
print(f"cholqr2 mode=r {M}x{N}: {t*1e3:.1f} ms  {fl/t/1e12:.2f} TFLOP/s", flush=True)

fq = jax.jit(lambda x: cholqr2_batched(x[None], mode="reduced", group=1, bp=16)[0])
sync(fq(a))
t = min(run_once(fq, a) for _ in range(3))
print(f"cholqr2 reduced {M}x{N}: {t*1e3:.1f} ms", flush=True)

# accuracy vs numpy on a column slice (full f64 oracle too big on host? 2GiB f32 -> fine)
r = np.asarray(cholqr2_batched(a[None], mode="r", group=1, bp=16)[0], np.float64)
qv, rv = cholqr2_batched(a[None], mode="reduced", group=1, bp=16)
q64 = np.asarray(qv[0], np.float64)
a64 = np.asarray(a, np.float64)
print(f"recon relerr: {np.linalg.norm(a64 - q64 @ np.asarray(rv[0], np.float64)) / np.linalg.norm(a64):.2e}", flush=True)
print(f"orth: {np.linalg.norm(q64.T @ q64 - np.eye(N)):.2e}", flush=True)
