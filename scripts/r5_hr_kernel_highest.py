#!/usr/bin/env python
"""Round-5 A/B: in-kernel HIGHEST whole-panel apply in the chunked hr
driver (VERDICT r4 missing-#1 / next-#1), plus the in-kernel precision
ladder (next-#2: b3 → b4 → highest).

Two measurement modes:
  --mode iso   isolated whole-panel apply (kernels/panel_apply.panel_apply)
               on the 16384-row update shape at each precision, vs the XLA
               _apply_block_t "highest" form — chained-k differencing (the
               tunnel's ~31 ms dispatch floor swamps sub-100 ms items).
  --mode e2e   full chunked-hr factorization at N² for each
               (precision, use_kernel) combo: warm wall (best-of-R direct
               differencing — at ≥200 ms of device work the floor is <15%)
               + FULL-WIDTH streamed relerr (utils.verify.relerr_streamed).

Methodology per BASELINE.md r4 notes: generate on device, sync via a
device→host scalar fetch, fresh padded buffer per run (the chunked driver
donates its input).
"""

import argparse
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

jax.config.update("jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def sync(x):
    leaf = jax.tree_util.tree_leaves(x)[0]
    _ = np.asarray(leaf.ravel()[0])


def run_once(f, *a):
    t0 = time.perf_counter()
    sync(f(*a))
    return time.perf_counter() - t0


def iso(n, reps):
    """Isolated whole-panel apply at the first-panel update shape of an
    n² factorization: y (n, nb), c (n, n − nb)."""
    from tileqr.drivers.square_hr import _apply_block_t, hr_panel
    from tileqr.kernels.panel_apply import panel_apply

    nb = 256
    key = jax.random.PRNGKey(0)
    a = jax.jit(
        lambda: jax.random.normal(key, (n, n), jnp.float32)
    )()
    sync(a)
    y, t, _ = hr_panel(a[:, :nb], False)
    c0 = a[:, nb:]
    sync((y, t))
    flops = 4.0 * n * nb * (n - nb)  # two (n,nb)x(n,q) contractions + sub

    def chain(f, k):
        @jax.jit
        def g(c):
            for _ in range(k):
                c = f(c) * jnp.float32(1.0)
            return c

        return g

    def per_iter(f, k):
        fk, f1 = chain(f, k), chain(f, 1)
        sync(fk(c0)); sync(f1(c0))
        tk = min(run_once(fk, c0) for _ in range(reps))
        t1 = min(run_once(f1, c0) for _ in range(reps))
        return max((tk - t1) / (k - 1), 1e-9)

    rows = []
    for prec in ("b3", "b4", "highest"):
        dt = per_iter(
            lambda c, p=prec: panel_apply(y, t, c, trans=True, precision=p),
            4,
        )
        rows.append({"form": f"kernel:{prec}", "ms": dt * 1e3,
                     "tflops": flops / dt / 1e12})
    for prec in ("highest",):
        pr = jax.lax.Precision.HIGHEST
        dt = per_iter(
            lambda c: _apply_block_t(y, t, c, pr, jnp.float32, trans=True), 4
        )
        rows.append({"form": f"xla:{prec}", "ms": dt * 1e3,
                     "tflops": flops / dt / 1e12})
    for r in rows:
        print(json.dumps({k: (round(v, 3) if isinstance(v, float) else v)
                          for k, v in r.items()}), flush=True)


def e2e(n, combos, reps):
    from tileqr.drivers.square_hr import (
        apply_q_hr_chunked, pad_for_hr, qr_hr_chunked,
    )
    from tileqr.utils.verify import relerr_streamed

    nb = 256
    key = jax.random.PRNGKey(0)
    gen = jax.jit(lambda: jax.random.normal(key, (n, n), jnp.float32))

    for prec, use_kernel in combos:
        def run():
            a = gen()
            sync(a)
            ap, _ = pad_for_hr(a, nb)
            del a
            t0 = time.perf_counter()
            r, panels = qr_hr_chunked(
                ap, nb, precision=prec, use_kernel=use_kernel,
            )
            sync(r)
            dt = time.perf_counter() - t0
            return dt, r, panels

        dt, r, panels = run()  # compile + cold
        walls = []
        for _ in range(reps):
            del r, panels
            w, r, panels = run()
            walls.append(w)
        flops = 2.0 * n * n * (n - n / 3.0)
        wall = min(walls)
        a_chk = gen()
        sync(a_chk)
        relerr = relerr_streamed(
            lambda c: apply_q_hr_chunked(
                panels, c, nb, trans=True, precision="highest"
            ),
            a_chk, r, col_block=2048,
        )
        del a_chk, r, panels
        print(json.dumps({
            "n": n, "precision": prec, "use_kernel": bool(use_kernel),
            "warm_ms": round(wall * 1e3, 1),
            "tflops": round(flops / wall / 1e12, 2),
            "relerr_fullwidth": float(f"{relerr:.4g}"),
        }), flush=True)


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--mode", choices=("iso", "e2e"), default="iso")
    p.add_argument("--n", type=int, default=16384)
    p.add_argument("--reps", type=int, default=3)
    p.add_argument(
        "--combos", default="highest:1,highest:0,b4:1,b3:1",
        help="e2e combos precision:use_kernel, comma-separated",
    )
    args = p.parse_args()
    print(f"# backend={jax.default_backend()} devices={jax.devices()}",
          flush=True)
    if args.mode == "iso":
        iso(args.n, args.reps)
    else:
        combos = [
            (c.split(":")[0], bool(int(c.split(":")[1])))
            for c in args.combos.split(",")
        ]
        e2e(args.n, combos, args.reps)
