#!/usr/bin/env python
"""Round-5: seg_panels × barrier_every sweep for the kernel-HIGHEST chunked
hr driver at 16384² (64 panels).

Motivation: the r5 kernel-apply A/B (scripts/r5_hr_kernel_highest.py) put
chunked-highest at 263.8 ms vs the static driver's 242.2 — the residual gap
is segment-boundary drains (8 jit dispatches at seg_panels=8) plus
optimization_barrier fences that the kernel path may not even need (the
carry is threaded through must-alias pallas calls, so the data dependency
chain is already strict; the barrier exists for the XLA path's deferred
R-row copy-outs). If a (seg_panels, barrier_every) point beats 242 ms, the
headline 16384² row moves to a driver that compiles in SECONDS (the static
driver's first compile is ~45 min uncached through this environment's
remote-compile service).

Each combo: fresh on-device A, qr_hr_chunked(precision="highest",
use_kernel default), warm best-of-3 direct differencing.
"""
import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

jax.config.update("jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from tileqr.drivers.square_hr import qr_hr_chunked  # noqa: E402


def sync(x):
    _ = np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[0])


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=16384)
    p.add_argument("--nb", type=int, default=256)
    p.add_argument("--precision", default="highest")
    p.add_argument("--segs", default="8,16,32")
    p.add_argument("--barriers", default="2,8,64")
    p.add_argument("--reps", type=int, default=3)
    args = p.parse_args()
    n, nb = args.n, args.nb
    flops = 2.0 * n * n * (n - n / 3.0)
    gen = jax.jit(
        lambda: jax.random.normal(jax.random.PRNGKey(0), (n, n), jnp.float32)
    )
    print(f"# backend={jax.default_backend()} n={n} nb={nb} "
          f"precision={args.precision}", flush=True)
    for sp in [int(x) for x in args.segs.split(",")]:
        for be in [int(x) for x in args.barriers.split(",")]:
            def run():
                a = gen()
                sync(a)
                t0 = time.perf_counter()
                r, panels = qr_hr_chunked(
                    a, nb, precision=args.precision, seg_panels=sp,
                    barrier_every=be,
                )
                sync(r)
                dt = time.perf_counter() - t0
                del r, panels
                return dt

            try:
                t_cold = run()
                walls = [run() for _ in range(args.reps)]
                best = min(walls)
                print(json.dumps({
                    "seg_panels": sp, "barrier_every": be,
                    "cold_s": round(t_cold, 1),
                    "warm_ms": round(best * 1e3, 1),
                    "tflops": round(flops / best / 1e12, 2),
                }), flush=True)
            except Exception as exc:
                print(json.dumps({
                    "seg_panels": sp, "barrier_every": be,
                    "error": f"{type(exc).__name__}: {str(exc)[:120]}",
                }), flush=True)


if __name__ == "__main__":
    main()
