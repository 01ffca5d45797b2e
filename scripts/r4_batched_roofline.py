"""Round-4 (VERDICT r3 missing-#5): close the config-4 roofline question
with a measured structural-floor statement.

Config 4 = 4096 independent 128² fp32 QRs. FLOP roofline: 4096 ·
2n²(m−n/3) = 11.4 GFLOP → 0.39 ms at the 29 TFLOP/s fp32-HIGHEST ceiling.
The shipping grouped kernel runs 24.9 ms (1.5% of ceiling). Hypothesis
(BASELINE.md r3): the path is LATENCY-bound on the serial column loop —
v5e has ONE TensorCore, Pallas grid steps execute sequentially, so the
wall is (B/g groups) × (n column steps) × t_step with t_step the fixed
small-op dispatch latency inside the kernel, and g is capped at 16 by the
Mosaic tpu_compile_helper crash at g=32 (r2, reproduced r3).

Measurement: qr_batched's grouped GEQRT at g ∈ {4, 8, 16} — total serial
column steps = (4096/g)·128 ∈ {131072, 65536, 32768}. If wall ∝ steps with
a common per-step latency, the floor is structural: halving wall needs
halving steps (g=32, blocked) or a different algorithm per step (cholqr2:
measured 33 ms NEGATIVE — its (B,128,128) HIGHEST matmul phases cost more
than the column loop saves; BASELINE.md r3).

Usage: python scripts/r4_batched_roofline.py
"""
import sys
import time

sys.path.insert(0, "/root/repo")
import numpy as np  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from tileqr.drivers.batched import geqrt_batched_grouped  # noqa: E402

B, N = 4096, 128
FLOPS = B * 2 * N * N * (N - N / 3)


def sync(r):
    _ = np.asarray(jax.tree_util.tree_leaves(r)[0].ravel()[0])


def run_once(f, x):
    t0 = time.perf_counter()
    sync(f(x))
    return time.perf_counter() - t0


def chained(g, ib, k=4, reps=3):
    def mk(kk):
        @jax.jit
        def f(x):
            for _ in range(kk):
                p, t = geqrt_batched_grouped(x, group=g, ib=ib)
                x = x + (p[0, 0, 0] * jnp.float32(1e-30))
            return p

        return f

    fk, f1 = mk(k), mk(1)
    a = jax.jit(
        lambda: jax.random.normal(jax.random.PRNGKey(0), (B, N, N), jnp.float32)
    )()
    sync(a)
    sync(fk(a)), sync(f1(a))
    tk = min(run_once(fk, a) for _ in range(reps))
    t1 = min(run_once(f1, a) for _ in range(reps))
    return (tk - t1) / (k - 1)


print(f"FLOP roofline: {FLOPS/29e12*1e3:.2f} ms at 29 TFLOP/s", flush=True)
rows = []
for g in [4, 8, 16]:
    t = chained(g, ib=32)
    steps = (B // g) * N
    rows.append((g, steps, t))
    print(
        f"g={g:2d}: {t*1e3:7.2f} ms  {FLOPS/t/1e12:5.2f} TFLOP/s  "
        f"{steps} serial column steps  {t/steps*1e9:6.0f} ns/step",
        flush=True,
    )

# linearity check: per-step latency spread across g values
lat = [t / s for _, s, t in rows]
print(
    f"per-step latency spread: {min(lat)*1e9:.0f}-{max(lat)*1e9:.0f} ns "
    f"({max(lat)/min(lat):.2f}x) — ~1.0x means wall tracks the serial "
    f"step count, i.e. the floor is structural dispatch latency, not flops",
    flush=True,
)
