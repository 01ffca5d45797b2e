"""Round-3: gram-panel sharded hr driver (drivers/sharded_hr.py) on the
real chip, 1×1 mesh — vs the dynamic Householder sharded driver and the
plain single-chip drivers at the same sizes.

The hr sharded path's pitch is (a) matmul-only panels (no latency-bound
column loops at all) and (b) one psum per phase instead of the TTQRT
ppermute tree — (b) is invisible on a 1×1 mesh, so this measures (a) plus
the shard_map/segment scaffolding. Methodology: single-dispatch best-of-5
(≈31 ms tunnel sync floor included; identical for every candidate), plus a
float64 numpy-R correctness check."""
import sys, time

sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from tileqr import QRConfig  # noqa: E402
from tileqr.drivers.sharded_hr import (  # noqa: E402
    apply_q_sharded_hr, assemble_r_sharded_hr, qr_sharded_factor_hr)


def sync(r):
    _ = np.asarray(jax.tree_util.tree_leaves(r)[0].ravel()[0])


def run_once(f, x):
    t0 = time.perf_counter()
    sync(f(x))
    return time.perf_counter() - t0


def flops(n):
    return 2 * n * n * (n - n / 3)


mesh = jax.make_mesh((1, 1), ("rows", "cols"))
cfg = QRConfig(nb=256, mesh_shape=(1, 1))

segments = int(sys.argv[1]) if len(sys.argv) > 1 else 8

for N in [2048, 4096, 8192]:
    a = jax.jit(lambda N=N: jax.random.normal(jax.random.PRNGKey(0), (N, N), jnp.float32))()
    sync(a)

    sh = jax.jit(
        lambda x: qr_sharded_factor_hr(x, mesh=mesh, config=cfg,
                                       segments=segments).r_diag
    )
    t0 = time.perf_counter(); sync(sh(a))
    print(f"sharded-hr 1x1 {N}^2 seg={segments} first (compile+run): "
          f"{time.perf_counter()-t0:.1f} s", flush=True)
    ts = min(run_once(sh, a) for _ in range(5))
    print(f"sharded-hr 1x1 {N}^2: {ts*1e3:.2f} ms  {flops(N)/ts/1e12:.2f} TFLOP/s",
          flush=True)

    # correctness of the compiled path on hardware (factor + assemble)
    f = qr_sharded_factor_hr(a, mesh=mesh, config=cfg, segments=segments)
    r = np.asarray(assemble_r_sharded_hr(f, mesh), np.float64)[:N]
    _, r_np = np.linalg.qr(np.asarray(a, np.float64))
    s = np.sign(np.diag(r_np)) * np.sign(np.diag(r))
    s[s == 0] = 1
    rel = np.linalg.norm(np.triu(r) * s[:, None] - r_np) / np.linalg.norm(r_np)
    print(f"sharded-hr 1x1 {N}^2 relerr vs numpy R: {rel:.2e}", flush=True)
