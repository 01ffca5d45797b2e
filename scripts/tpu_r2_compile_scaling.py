"""Measure trace+compile time vs panel count (VERDICT r1 next-#7): fresh
compiles (no persistent cache) of qr_tiled at growing N; extrapolate 32768²."""
import sys, time

sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp  # noqa: E402

# NOTE: deliberately no persistent compilation cache here

from tileqr.drivers.square import qr_tiled  # noqa: E402

rng = np.random.default_rng(0)
for n in (1024, 2048, 4096):
    a = jnp.asarray(rng.standard_normal((n, n)).astype(np.float32))

    @jax.jit
    def f(x):
        return qr_tiled(x, 256, chunk=4)[0]

    t0 = time.perf_counter()
    lowered = f.lower(a)
    t1 = time.perf_counter()
    compiled = lowered.compile()
    t2 = time.perf_counter()
    print(
        f"N={n} ({n//256} panels): trace+lower {t1-t0:.1f} s, compile {t2-t1:.1f} s",
        flush=True,
    )
