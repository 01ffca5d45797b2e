"""Round-3: config-3 tall-skinny CholeskyQR2 AFTER the pairwise-accumulation
fix (commit be6d354: cholqr2_batched's tall contractions ride
bdot_pair_rows — at 1048576 rows the gram accumulates over a 256-leaf
binary tree of 4096-row blocks instead of one sequential fp32 chain).

Pre-fix record (BASELINE.md r3): 70.8 ms chained but relerr 3.7e-06 — the
gram floor kept cholqr2 a documented fast option while the 115.1 ms chain
stayed the acceptance default. If the pairwise gram pulls relerr near the
1e-6 gate, the config-3 lineup changes.

Residuals at HIGHEST precision on device (the DEFAULT-precision q@r check
would add ~1e-3 of its own noise — the documented verify gotcha)."""
import sys, time

sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from tileqr.drivers.cholqr import cholqr2_batched  # noqa: E402

HI = jax.lax.Precision.HIGHEST


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


def mk(k):
    @jax.jit
    def f(x):
        for _ in range(k):
            x = cholqr2_batched(x[None], mode="reduced", group=1, bp=16)[0][0]
        return x
    return f


fk, f1 = mk(3), mk(1)
sync(fk(a))
sync(f1(a))
tk = min(run_once(fk, a) for _ in range(3))
t1 = min(run_once(f1, a) for _ in range(3))
t = (tk - t1) / 2
print(
    f"cholqr2 reduced CHAINED per-iter: {t*1e3:.1f} ms  {fl/t/1e12:.2f} TFLOP/s",
    flush=True,
)


@jax.jit
def acc(x):
    q, r = cholqr2_batched(x[None], mode="reduced", group=1, bp=16)
    q, r = q[0], r[0]
    qr = jnp.dot(q, r, precision=HI, preferred_element_type=jnp.float32)
    res = jnp.linalg.norm(x - qr) / jnp.linalg.norm(x)
    qtq = jax.lax.dot_general(
        q, q, (((0,), (0,)), ((), ())), precision=HI,
        preferred_element_type=jnp.float32,
    )
    orth = jnp.linalg.norm(qtq - jnp.eye(N, dtype=q.dtype))
    return res, orth


res, orth = acc(a)
print(f"recon relerr (HIGHEST check): {float(res):.2e}  orth: {float(orth):.2e}", flush=True)
