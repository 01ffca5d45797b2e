"""Round-3 (VERDICT r2 next-#4): sharded-path overhead on the real chip.

1×1-mesh dynamic sharded driver vs the plain dynamic square driver at
2048²/4096² — same chip, same methodology (chained differencing where sizes
are small; the sharded path also measured single-dispatch). The delta bounds
what the shard_map/collective scaffolding costs with zero actual ICI
traffic; the per-tile local chain vs the plain driver's chunked couples is
the other (algorithmic) component of the gap."""
import sys, time

sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from tileqr import QRConfig  # noqa: E402
from tileqr.drivers.sharded_dyn import (  # noqa: E402
    qr_sharded_factor_dyn, assemble_r_sharded_dyn)
from tileqr.drivers.square_dyn import _qr_tiled_dyn_jit  # noqa: E402


def sync(r):
    _ = np.asarray(jax.tree_util.tree_leaves(r)[0].ravel()[0])


def run_once(f, x):
    t0 = time.perf_counter()
    sync(f(x))
    return time.perf_counter() - t0


def flops(n):
    return 2 * n * n * (n - n / 3)


mesh = jax.make_mesh((1, 1), ("rows", "cols"))
cfg = QRConfig(nb=256, ib=128, mesh_shape=(1, 1))

for N in [2048, 4096]:
    a = jax.jit(lambda N=N: jax.random.normal(jax.random.PRNGKey(0), (N, N), jnp.float32))()
    sync(a)

    sh = jax.jit(lambda x: qr_sharded_factor_dyn(x, mesh=mesh, config=cfg).r_diag)
    t0 = time.perf_counter(); sync(sh(a))
    print(f"sharded 1x1 {N}^2 first (compile+run): {time.perf_counter()-t0:.1f} s", flush=True)
    ts = min(run_once(sh, a) for _ in range(5))
    print(f"sharded 1x1 {N}^2: {ts*1e3:.2f} ms  {flops(N)/ts/1e12:.2f} TFLOP/s", flush=True)

    pl_ = jax.jit(lambda x: _qr_tiled_dyn_jit(x, 256, 128, 4, "highest", False)[1])
    sync(pl_(a))
    tp = min(run_once(pl_, a) for _ in range(5))
    print(f"plain dyn   {N}^2: {tp*1e3:.2f} ms  {flops(N)/tp/1e12:.2f} TFLOP/s  "
          f"(sharded overhead {ts/tp:.2f}x)", flush=True)

    # correctness of the compiled sharded path on hardware
    f = qr_sharded_factor_dyn(a, mesh=mesh, config=cfg)
    r = np.asarray(assemble_r_sharded_dyn(f, mesh), np.float64)
    _, r_np = np.linalg.qr(np.asarray(a, np.float64))
    s = np.sign(np.diag(r_np)) * np.sign(np.diag(r))
    s[s == 0] = 1
    rel = np.linalg.norm(r * s[:, None] - r_np) / np.linalg.norm(r_np)
    print(f"sharded 1x1 {N}^2 relerr vs numpy R: {rel:.2e}", flush=True)
