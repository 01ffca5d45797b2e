"""Round-4 (VERDICT r3 weak-#6): measure static-hr b3 vs chunked-hr b3
BELOW 32 panels, so the api.py routing rule (`precision="b3"` always takes
the chunked driver) is measured rather than asserted.

The chunked driver hosts the aliased in-place Pallas panel-apply; the
static driver's b3 path goes through _apply_block_t → panel_apply in VALUE
form (same kernel, no aliasing, plus whole-program XLA scheduling instead
of segment boundaries). At ≥32 panels chunked was measured ≈1.4× static-hh
cost structure; below that the segment-boundary drains could flip the
ordering — this probe decides.

Usage: python scripts/r4_b3_routing.py [sizes...]  (default 4096 8192)
"""
import sys
import time

sys.path.insert(0, "/root/repo")
import numpy as np  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from tileqr.drivers.square_hr import qr_hr, qr_hr_chunked  # noqa: E402

NB = 256


def sync(r):
    _ = np.asarray(jax.tree_util.tree_leaves(r)[0].ravel()[0])


def flops(n):
    return 2 * n * n * (n - n / 3)


def best_of(f, x, k=5):
    ts = []
    for _ in range(k):
        t0 = time.perf_counter()
        sync(f(x))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def relerr_r(a, r):
    rn = np.linalg.qr(np.asarray(a, np.float64), mode="r")
    k = min(a.shape)
    return np.abs(np.abs(np.asarray(r, np.float64)[:k]) - np.abs(rn)).max() / np.abs(rn).max()


for n in [int(s) for s in sys.argv[1:]] or [4096, 8192]:
    a = jax.jit(
        lambda n=n: jax.random.normal(jax.random.PRNGKey(0), (n, n), jnp.float32)
    )()
    sync(a)

    static = jax.jit(lambda x: qr_hr(x, NB, precision="b3"))
    t0 = time.perf_counter()
    r_s = static(a)
    sync(r_s[0])
    print(f"static-b3  {n}^2 first: {time.perf_counter()-t0:.1f} s", flush=True)
    ts = best_of(lambda x: static(x)[0], a)
    print(
        f"static-b3  {n}^2 ({n//NB} panels): {ts*1e3:7.2f} ms  "
        f"{flops(n)/ts/1e12:5.2f} TFLOP/s  relerr {relerr_r(a, r_s[0]):.2e}",
        flush=True,
    )

    # qr_hr_chunked DONATES its input: hand each timed run a fresh copy
    # (the eager add allocates one; its cost is ~0.1 ms at 4096², identical
    # across reps)
    fresh = lambda x: x + jnp.zeros((), x.dtype)  # noqa: E731
    t0 = time.perf_counter()
    r_c = qr_hr_chunked(fresh(a), NB, precision="b3")
    sync(r_c[0])
    print(f"chunked-b3 {n}^2 first: {time.perf_counter()-t0:.1f} s", flush=True)
    tc = best_of(lambda x: qr_hr_chunked(fresh(x), NB, precision="b3")[0], a)
    print(
        f"chunked-b3 {n}^2 ({n//NB} panels): {tc*1e3:7.2f} ms  "
        f"{flops(n)/tc/1e12:5.2f} TFLOP/s  relerr {relerr_r(a, r_c[0]):.2e}  "
        f"static/chunked = {ts/tc:.2f}x",
        flush=True,
    )
