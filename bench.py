#!/usr/bin/env python
"""Benchmark entry (driver contract): prints ONE JSON line
{"metric": ..., "value": N, "unit": ..., "vs_baseline": N}.

Headline metric (VERDICT r2 next-#3: the driver-captured artifact must show
the north-star number): tiled-QR fp32 TFLOP/s at N=16384 on one chip — the
BASELINE.json:5 gate config (≥70% of the ~29 TFLOP/s fp32-HIGHEST matmul
ceiling). vs_baseline = speedup over jnp.linalg.qr on the same device/dtype.
The 16384² static executable is served from the in-repo compile cache
(.jax_cache); if the cache were cold this build would take ~45 min, so a
TILEQR_BENCH_N=8192 override keeps the r1/r2 continuity row cheap to
reproduce.

Timing methodology (BASELINE.md notes + measured here): this environment's
TPU is behind an RPC tunnel with a ~30 ms per-dispatch sync floor and an
unreliable block_until_ready, so BOTH candidates are timed by chaining K
dependent iterations inside ONE jitted executable and differencing a K-iter
run against a 1-iter run (per-iter = (T_K - T_1)/(K - 1)), synced by a
device→host transfer.
"""

import json
import os
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

def _configure_cache():
    """Persistent compilation cache: the 64-panel executables take minutes
    through this environment's remote-compile service; cache entries live in
    the repo so repeat bench runs skip recompilation. Called from main(), NOT
    at import time — importing this module (test_bench does) must not clobber
    the pytest conftest's CPU cache settings for the rest of the suite."""
    jax.config.update(
        "jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache")
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from tileqr.drivers.square import qr_tiled  # noqa: E402
from tileqr.drivers.square_dyn import _qr_tiled_dyn_jit  # noqa: E402
from tileqr.drivers.square_hr import qr_hr  # noqa: E402

# Default is the CONTRACT size (BASELINE.json:11): the r5 in-kernel HIGHEST
# chunked-hr path runs 32768² warm at ~27 TFLOP/s / 14.5× over
# jnp.linalg.qr(mode="r") (BASELINE.md r5) and its segment executables are
# bounded-compile (seconds each, served from .jax_cache). If anything fails
# at this size, main() falls back to the 16384² static-hr gate config.
N = int(os.environ.get("TILEQR_BENCH_N", "32768"))
NB = int(os.environ.get("TILEQR_BENCH_NB", "256"))
CHUNK = int(os.environ.get("TILEQR_BENCH_CHUNK", "4"))
PRECISION = os.environ.get("TILEQR_BENCH_PRECISION", "highest")
CHAIN = int(os.environ.get("TILEQR_BENCH_CHAIN", "3"))
# "static" (trace-unrolled, fastest steady-state, needs the compile cache at
# 16384²) or "dynamic" (O(1)-kernel driver, compiles in seconds at any size)
DRIVER = os.environ.get("TILEQR_BENCH_DRIVER", "static")
# "hr" (CholeskyQR2 panels + Householder reconstruction — matmul-only
# panels; with the r3 pairwise/Kahan/split-K accumulation fixes it is BOTH
# the fastest measured square path AND inside the ≤1e-6 gate at 16384²:
# 242.18 ms / 24.21 TFLOP/s, relerr 4.41e-07, BASELINE.md r3; cond(A) ≲ 1e3
# contract — the benchmark's gaussian input is far inside it) or "hh"
# (tiled Householder, unconditionally stable, 280.5 ms / 20.91 at 16384²)
METHOD = os.environ.get("TILEQR_BENCH_METHOD", "hr")


def qr_flops(m, n):
    return 2.0 * n * n * (m - n / 3.0)


def sync(x):
    leaf = jax.tree_util.tree_leaves(x)[0]
    _ = np.asarray(leaf.ravel()[0])


def run_once(f, x):
    t0 = time.perf_counter()
    sync(f(x))
    return time.perf_counter() - t0


def per_iter_time(make_chain, x, k):
    fk, f1 = make_chain(k), make_chain(1)
    sync(fk(x))
    sync(f1(x))
    tk = min(run_once(fk, x) for _ in range(3))
    t1 = min(run_once(f1, x) for _ in range(3))
    return max((tk - t1) / (k - 1), 1e-9)


def main():
    _configure_cache()
    try:
        _bench(N)
        return
    except Exception as exc:  # contract-size safety net (HBM/tunnel)
        if N <= 16384:
            raise
        print(f"# {N}x{N} bench failed ({type(exc).__name__}: "
              f"{str(exc)[:120]}); falling back to 16384", file=sys.stderr)
    # fall back OUTSIDE the except block: the exception's traceback pins
    # _bench(N)'s frame (and its multi-GiB device arrays) until the handler
    # exits — running the 16384 bench inside it would re-OOM the chip
    import gc

    gc.collect()
    _bench(16384)


def _bench(N):
    on_tpu = jax.default_backend() == "tpu"
    # generate ON DEVICE: the TPU tunnel's host→device bandwidth varies from
    # 23 MB/s down to ~2 MB/s (measured r3) — a 1 GiB host transfer can cost
    # 8 minutes, none of it the benchmark's business
    a = jax.jit(
        lambda: jax.random.normal(jax.random.PRNGKey(0), (N, N), jnp.float32)
    )()
    sync(a)

    # Contract-size capability (TILEQR_BENCH_N=32768, VERDICT r3 next-#1):
    # the trace-unrolled static hr driver cannot compile at 128 panels (XLA
    # buffer assignment OOM, BASELINE.md r3), so beyond 64 panels the hr
    # method routes through the bounded-compile chunked driver (since r5:
    # the in-kernel aliased HIGHEST whole-panel apply — no barrier temps,
    # which is what lets the warm run fit at this size), timed by direct
    # differencing of whole runs — at ≥2 s of device work per run the
    # ~30 ms tunnel sync floor is <2%, so chaining inside one executable is
    # no longer needed for meaningful numbers.
    if METHOD == "hr" and N // NB > 64:
        from tileqr.drivers.square_hr import pad_for_hr, qr_hr_chunked

        def run_chunked():
            ap, _ = pad_for_hr(a, NB)
            t0 = time.perf_counter()
            r, panels = qr_hr_chunked(
                ap, NB, precision=PRECISION, interpret=not on_tpu
            )
            sync(r)
            dt = time.perf_counter() - t0
            del r, panels
            return dt

        run_chunked()  # compile (segment executables are cached)
        # ONE timed warm run (not min-of-2): each extra 32768² run costs
        # minutes of tunnel free-drain for its 4-GiB buffers against ~2.5%
        # warm variance (BASELINE.md r5 campaign: 1739.8 vs 1783.2 ms) —
        # keeping the artifact run inside the driver's bench budget matters
        # more than the second sample
        t_ours = run_chunked()

        def run_base():
            # mode="r" (geqrf, no Q formation): the factor-only comparison —
            # our run also returns R + implicit factors, and the full-QR
            # baseline's extra 8 GiB of Q/R outputs risks HBM at this size
            t0 = time.perf_counter()
            r = jax.jit(lambda x: jnp.linalg.qr(x, mode="r"))(a)
            sync(r)
            dt = time.perf_counter() - t0
            del r
            return dt

        run_base()
        # the baseline keeps min-of-2: a single geqrf sample through the
        # tunnel can run ~1.5× slow and overstate vs_baseline (observed
        # 26× vs the repeatable ~16×); its buffers are small enough that
        # the extra run costs seconds of drain, unlike ours
        t_base = min(run_base() for _ in range(2))
        tflops = qr_flops(N, N) / t_ours / 1e12
        print(
            json.dumps(
                {
                    "metric": f"tiled QR fp32 TFLOP/s @ {N}x{N} (nb={NB}, "
                    f"{PRECISION}, method=hr-chunked)",
                    "value": round(tflops, 3),
                    "unit": "TFLOP/s",
                    "vs_baseline": round(t_base / t_ours, 3),
                }
            )
        )
        return

    def step(x):
        if METHOD == "hr":
            r, _ = qr_hr(x, NB, precision=PRECISION, interpret=not on_tpu)
            # dependence without changing the input distribution
            return x + r * jnp.float32(1e-30)
        if DRIVER == "dynamic":
            return _qr_tiled_dyn_jit(x, NB, 128, CHUNK, PRECISION, not on_tpu)[0]
        return qr_tiled(x, NB, chunk=CHUNK, precision=PRECISION, interpret=not on_tpu)[0]

    def make_ours(k):
        @jax.jit
        def f(x):
            for _ in range(k):
                x = step(x)
            return x

        return f

    def make_baseline(k):
        @jax.jit
        def f(x):
            for _ in range(k):
                q, r = jnp.linalg.qr(x)
                x = q + r * jnp.float32(1e-6)
            return x

        return f

    t_ours = per_iter_time(make_ours, a, CHAIN)
    t_base = per_iter_time(make_baseline, a, CHAIN)
    tflops = qr_flops(N, N) / t_ours / 1e12
    print(
        json.dumps(
            {
                "metric": f"tiled QR fp32 TFLOP/s @ {N}x{N} (nb={NB}, chunk={CHUNK}, {PRECISION}, "
                + (f"method={METHOD})" if METHOD != "hh" else f"{DRIVER})"),
                "value": round(tflops, 3),
                "unit": "TFLOP/s",
                "vs_baseline": round(t_base / t_ours, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
