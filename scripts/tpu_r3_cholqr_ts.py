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

# chained timing too (subtract the ~31 ms dispatch floor properly):
def mk(k):
    @jax.jit
    def f(x):
        for _ in range(k):
            x = cholqr2_batched(x[None], mode="reduced", group=1, bp=16)[0][0]
        return x
    return f
fk, f1 = mk(3), mk(1)
sync(fk(a)); sync(f1(a))
tk = min(run_once(fk, a) for _ in range(3))
t1 = min(run_once(f1, a) for _ in range(3))
print(f"cholqr2 reduced CHAINED per-iter: {(tk-t1)/2*1e3:.1f} ms", flush=True)

# accuracy computed ON DEVICE (a 2 GiB host gather takes ~15 min through
# this tunnel); scalars only cross to host
@jax.jit
def acc(x):
    q, r = cholqr2_batched(x[None], mode="reduced", group=1, bp=16)
    q, r = q[0], r[0]
    res = jnp.linalg.norm(x - q @ r) / jnp.linalg.norm(x)
    orth = jnp.linalg.norm(q.T @ q - jnp.eye(N, dtype=q.dtype))
    return res, orth
res, orth = acc(a)
print(f"recon relerr: {float(res):.2e}  orth: {float(orth):.2e}", flush=True)
