"""Round-3 final TPU sequence in ONE patient client: wait for the tunnel to
recover (no external kills — killing clients mid-flight wedges the tunnel
for ~40 min), then config-3 cholqr2 measurements. bench.py runs separately
afterwards (never two TPU clients at once)."""
import sys, time

sys.path.insert(0, "/root/repo")
import numpy as np  # noqa: E402

import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp  # noqa: E402

t0 = time.time()
print(f"[{time.strftime('%H:%M:%S')}] waiting for device...", flush=True)
x = jax.jit(lambda: jnp.ones((8, 128)).sum())()
_ = np.asarray(x)
print(f"[{time.strftime('%H:%M:%S')}] device up after {time.time()-t0:.0f} s", flush=True)

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
print(f"cholqr2 mode=r {M}x{N}: {t*1e3:.1f} ms  {fl/t/1e12:.2f} TFLOP/s (single-dispatch)", flush=True)


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
print(f"cholqr2 reduced CHAINED per-iter: {(tk-t1)/2*1e3:.1f} ms "
      f"(single-dispatch {t1*1e3:.1f} ms)", flush=True)


@jax.jit
def acc(x):
    q, r = cholqr2_batched(x[None], mode="reduced", group=1, bp=16)
    q, r = q[0], r[0]
    res = jnp.linalg.norm(x - q @ r) / jnp.linalg.norm(x)
    orth = jnp.linalg.norm(q.T @ q - jnp.eye(N, dtype=q.dtype))
    return res, orth


res, orth = acc(a)
print(f"cholqr2 ts recon relerr: {float(res):.2e}  orth: {float(orth):.2e}", flush=True)

print("ts section done", flush=True)
