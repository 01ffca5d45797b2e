"""Round-3: gram-panel sharded driver with precision="b3" on the chip
(1×1 mesh) — compiled-Mosaic smoke + perf vs the highest sharded-hr path.

The local update halves run as the split Pallas whole-panel kernels
(kernels/panel_apply.py panel_project/panel_sub) with the psum between
them. Single-dispatch best-of-3 (~31 ms tunnel floor included)."""
import sys, time

sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from tileqr import QRConfig  # noqa: E402
from tileqr.drivers.sharded_hr import (  # noqa: E402
    assemble_r_sharded_hr,
    qr_sharded_factor_hr,
)


@jax.jit
def _tiny(x):
    # jitted tiny-slice: eager ops on big/sharded arrays either fail to
    # reshape (sharded) or transfer through the tunnel (the BASELINE.md r3
    # eager-op hazard); a jitted scalar output syncs on the producer only
    return x[(0,) * x.ndim]


def sync(x):
    _ = np.asarray(_tiny(jax.tree_util.tree_leaves(x)[0]))


def bench(n, precision):
    mesh = jax.make_mesh((1, 1), ("rows", "cols"))
    cfg = QRConfig(nb=256, mesh_shape=(1, 1), square_method="hr",
                   precision=precision, interpret=False)
    a = jax.jit(
        lambda: jax.random.normal(jax.random.PRNGKey(0), (n, n), jnp.float32)
    )()
    sync(a)
    # ONE jit around the whole driver: called eagerly, _to_local_layout's
    # pack runs as eager ops — the tunnel eager hazard measured 56 s for a
    # 40 ms factorization
    fac = jax.jit(
        lambda x: qr_sharded_factor_hr(x, mesh=mesh, config=cfg).r_diag
    )
    t0 = time.perf_counter()
    sync(fac(a))
    t_first = time.perf_counter() - t0
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        sync(fac(a))
        times.append(time.perf_counter() - t0)
    t = min(times)
    f = qr_sharded_factor_hr(a, mesh=mesh, config=cfg)
    r = np.asarray(assemble_r_sharded_hr(f, mesh), np.float64)
    rn = np.linalg.qr(np.asarray(a, np.float64), mode="r")
    s = np.sign(np.diag(rn)) * np.sign(np.diag(r[: len(rn)]))
    s[s == 0] = 1
    rel = np.linalg.norm(r[: len(rn)] * s[:, None] - rn) / np.linalg.norm(rn)
    print(
        f"sharded-hr 1x1 {n}^2 {precision}: {t*1e3:.1f} ms raw "
        f"(compile+first {t_first:.0f} s)  relerr-vs-numpy {rel:.2e}",
        flush=True,
    )


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    bench(n, "b3")
    bench(n, "highest")
