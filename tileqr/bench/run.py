"""Benchmark sweep harness (reference component C11, SURVEY.md §2.1/§5).

Emits one JSON line per measurement (size, nb, ib, precision, wall ms,
TFLOP/s, relerr) — the structured bench output that feeds BASELINE.md.

Timing: chained-executable differencing (see /bench.py docstring) — this
environment's TPU tunnel has a ~30 ms per-dispatch sync floor, so per-iter
time = (T_K − T_1)/(K − 1) with both chains inside single jitted executables.

Usage:
  python -m tileqr.bench.run --sizes 1024,4096 --nbs 256 --precisions highest
  python -m tileqr.bench.run --mode tsqr --sizes 1048576 --cols 512
  python -m tileqr.bench.run --mode batched --batch 4096 --cols 128
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np

import jax
import jax.numpy as jnp


def qr_flops(m, n):
    return 2.0 * n * n * (m - n / 3.0)


def sync(x):
    leaf = jax.tree_util.tree_leaves(x)[0]
    _ = np.asarray(leaf.ravel()[0])


def run_once(f, x):
    t0 = time.perf_counter()
    sync(f(x))
    return time.perf_counter() - t0


def per_iter(make_chain, x, k, reps=3):
    fk, f1 = make_chain(k), make_chain(1)
    sync(fk(x))
    sync(f1(x))
    tk = min(run_once(fk, x) for _ in range(reps))
    t1 = min(run_once(f1, x) for _ in range(reps))
    return max((tk - t1) / (k - 1), 1e-9)


def bench_square(n, nb, ib, precision, chain, check, chunk=4,
                 method="hh", driver="static"):
    """One square-QR measurement of the SHIPPING paths (VERDICT r3 weak-#2:
    every BASELINE.md headline row must be reproducible by one CLI line):

      --method hh --driver static    trace-unrolled tiled Householder
      --method hh --driver dynamic   bounded-compile fori_loop HH driver
      --method hr --driver static    CholeskyQR2 + Householder reconstruction
      --method hr --driver chunked   bounded-compile segmented hr (the only
                                     hr route past 64 panels; Python loop
                                     over donated segment executables, so it
                                     is timed by whole-run differencing, not
                                     in-executable chaining)

    --check emits the FULL-WIDTH streamed relerr (utils.verify.relerr_streamed
    — 512-col slice checks are banned for acceptance rows, BASELINE.md r3)."""
    on_tpu = jax.default_backend() == "tpu"
    interp = not on_tpu
    a = jnp.asarray(np.random.default_rng(0).standard_normal((n, n)).astype(np.float32))
    if (method, driver) in (("hh", "chunked"), ("hr", "dynamic")):
        raise SystemExit(f"no {method} driver {driver!r} "
                         "(hh: static/dynamic; hr: static/chunked)")
    if method == "hr" and n % nb:
        raise SystemExit(f"hr bench requires n % nb == 0 (got {n}, {nb})")

    if method == "hr":
        from tileqr.drivers.square_hr import (
            apply_q_hr, apply_q_hr_chunked, qr_hr, qr_hr_chunked,
        )

        if driver == "chunked":
            def run():
                x = a + jnp.zeros((), a.dtype)  # fresh buffer (donated)
                t0 = time.perf_counter()
                r, panels = qr_hr_chunked(x, nb, precision=precision,
                                          interpret=interp)
                sync(r)
                return time.perf_counter() - t0, r, panels

            t, r, panels = run()
            t = min(t, *(run()[0] for _ in range(2)))
        else:
            def make(k):
                @jax.jit
                def f(x):
                    for _ in range(k):
                        r, _ = qr_hr(x, nb, precision=precision,
                                     interpret=interp)
                        x = x + r * jnp.float32(1e-30)
                    return x

                return f

            t = per_iter(make, a, chain)
    elif driver == "dynamic":
        from tileqr.drivers.square_dyn import qr_tiled_dyn

        def make(k):
            @jax.jit
            def f(x):
                for _ in range(k):
                    x = qr_tiled_dyn(x, nb, ib=ib, chunk=chunk,
                                     precision=precision, interpret=interp)[0]
                return x

            return f

        t = per_iter(make, a, chain)
    else:
        from tileqr.drivers.square import qr_tiled

        def make(k):
            @jax.jit
            def f(x):
                for _ in range(k):
                    x = qr_tiled(x, nb, ib=ib, chunk=chunk,
                                 precision=precision, interpret=interp)[0]
                return x

            return f

        t = per_iter(make, a, chain)

    rec = {
        "bench": "qr_square", "method": method, "driver": driver,
        "n": n, "nb": nb, "ib": ib, "chunk": chunk,
        "precision": precision, "ms": round(t * 1e3, 6),
        "tflops": round(qr_flops(n, n) / t / 1e12, 9),
        "backend": jax.default_backend(),
    }
    if check:
        from tileqr.utils.verify import relerr_streamed

        if method == "hr":
            if driver == "chunked":
                apply_qt = lambda c: apply_q_hr_chunked(  # noqa: E731
                    panels, c, nb, trans=True, precision="highest",
                    interpret=interp)
            else:
                r, panels = qr_hr(a, nb, precision=precision,
                                  interpret=interp)
                apply_qt = lambda c: apply_q_hr(  # noqa: E731
                    panels, c, nb, trans=True, precision="highest",
                    interpret=interp)
        elif driver == "dynamic":
            from tileqr.drivers.square import assemble_r
            from tileqr.drivers.square_dyn import (
                apply_q_tiled_dyn, qr_tiled_dyn,
            )

            a_out, df = qr_tiled_dyn(a, nb, ib=ib, chunk=chunk,
                                     precision=precision, interpret=interp)
            r = assemble_r(a_out, df.r_diag, nb)
            apply_qt = lambda c: apply_q_tiled_dyn(  # noqa: E731
                df, c, trans=True, precision="highest", interpret=interp)
        else:
            from tileqr.drivers.square import (
                apply_q_tiled, assemble_r, qr_tiled,
            )

            packed, r_diag, t_geqrt, panels = qr_tiled(
                a, nb, ib=ib, chunk=chunk, precision=precision,
                interpret=interp)
            r = assemble_r(packed, r_diag, nb)
            apply_qt = lambda c: apply_q_tiled(  # noqa: E731
                panels, t_geqrt, c, nb, chunk=chunk, trans=True,
                precision="highest", interpret=interp)
        # hr-chunked applies DONATE the target; relerr_streamed's ordering
        # is donation-safe
        rec["relerr"] = relerr_streamed(
            apply_qt, a, r, col_block=min(n, 2048))
        # the verification apply always runs HIGHEST (same convention as
        # scripts/r4_contract_requal.py): for emulated timed rows (b3/b4)
        # relerr measures the FACTOR's backward error through an accurate
        # apply, not the emulated apply path itself — recorded explicitly
        # so rows aren't misread (ADVICE r4 #3)
        rec["check_precision"] = "highest"
    return rec


def bench_jnp_qr(n, chain):
    a = jnp.asarray(np.random.default_rng(0).standard_normal((n, n)).astype(np.float32))

    def make(k):
        @jax.jit
        def f(x):
            for _ in range(k):
                q, r = jnp.linalg.qr(x)
                x = q + r * jnp.float32(1e-6)
            return x

        return f

    t = per_iter(make, a, chain)
    return {
        "bench": "jnp_linalg_qr", "n": n, "ms": round(t * 1e3, 6),
        "tflops": round(qr_flops(n, n) / t / 1e12, 9),
        "backend": jax.default_backend(),
    }


def bench_tsqr(m, cols, nb, chain, strategy="tree", check=False,
               precision="highest"):
    """Tall-skinny measurement through the PUBLIC tsqr API so every shipping
    strategy is one CLI line (VERDICT r3 weak-#2):

      --strategy tree      TSQR/TTQRT tree (the factor/apply + cross-chip path)
      --strategy chain     chunked square driver, one wide panel (the
                           single-chip auto default)
      --strategy cholqr2   gram + batched POTRF + matmul correction (fastest
                           single-chip R, cond(A) ≲ 1e3 contract)

    --check compares R against numpy's (sign-fixed row signs — R-uniqueness,
    SURVEY §4 tall-skinny row)."""
    import tileqr

    on_tpu = jax.default_backend() == "tpu"
    # hr_guard="off" keeps the cholqr2 path traceable inside the chained
    # timing executable (the guard's fallback branch is a host decision)
    cfg = tileqr.QRConfig(
        nb=max(nb, cols), ib=128 if on_tpu else 8,
        interpret=not on_tpu, precision=precision, hr_guard="off",
    )
    a = jnp.asarray(np.random.default_rng(0).standard_normal((m, cols)).astype(np.float32))

    def make(k):
        @jax.jit
        def f(x):
            r = None
            for _ in range(k):
                r = tileqr.tsqr(x, mode="r", config=cfg, strategy=strategy)
                x = x + r[0, 0] * jnp.float32(1e-9)
            return x

        return f

    t = per_iter(make, a, chain)
    rec = {
        # nb_cfg (NOT "nb"): since the r4 route through the public tsqr
        # API, QRConfig(nb=max(nb, cols)) only bounds the panel width — the
        # tree strategy's leaf sizing is auto_leaf_rows, no longer the
        # --nbs sweep value. Renamed so pre-r4 sweep records (where "nb"
        # WAS the leaf size) aren't conflated with new ones (ADVICE r4 #2).
        "bench": "tsqr", "strategy": strategy, "m": m, "n": cols,
        "nb_cfg": max(nb, cols),
        "precision": precision, "ms": round(t * 1e3, 6),
        "tflops": round(qr_flops(m, cols) / t / 1e12, 9),
        "backend": jax.default_backend(),
    }
    if check:
        r = np.asarray(
            tileqr.tsqr(a, mode="r", config=cfg, strategy=strategy),
            np.float64,
        )
        r_np = np.linalg.qr(np.asarray(a, np.float64), mode="r")
        # sign-fix both to positive diagonals (R unique up to row signs)
        r = np.where(np.diag(r) < 0, -1.0, 1.0)[:, None] * r
        r_np = np.where(np.diag(r_np) < 0, -1.0, 1.0)[:, None] * r_np
        rec["relerr_r"] = float(
            np.linalg.norm(r - r_np) / np.linalg.norm(r_np)
        )
    return rec


def bench_batched(batch, cols, chain, check=False, method="hh"):
    """Measures the production qr_batched path: method="hh" (grouped
    Householder kernel — the per-matrix-grid geqrt_batched is ~6.8x slower
    and not what ships) or "cholqr2" (drivers/cholqr.py)."""
    from tileqr.drivers.batched import qr_batched as _hh
    from tileqr.drivers.cholqr import cholqr2_batched

    on_tpu = jax.default_backend() == "tpu"
    a = jnp.asarray(
        np.random.default_rng(0).standard_normal((batch, cols, cols)).astype(np.float32)
    )

    def qr_batched(x, interpret=None):
        if method == "cholqr2":
            return cholqr2_batched(x, interpret=interpret)
        return _hh(x, interpret=interpret)

    def make(k):
        @jax.jit
        def f(x):
            for _ in range(k):
                q, r = qr_batched(x, interpret=not on_tpu)
                x = q + r * jnp.float32(1e-9)
            return x

        return f

    # shared policy helper so the record names the kernel that actually ran
    # (vec fallback when no power-of-2 group divides B)
    from tileqr.drivers.batched import select_group

    group = select_group(batch)
    t = per_iter(make, a, chain)
    kern = ("cholqr2" if method == "cholqr2"
            else (f"grouped(g={group})" if group > 1 else "vec"))
    rec = {
        "bench": "qr_batched",
        "kernel": kern,
        "batch": batch, "n": cols,
        "ms": round(t * 1e3, 6),
        "tflops": round(batch * qr_flops(cols, cols) / t / 1e12, 9),
        "backend": jax.default_backend(),
    }
    if check:
        q, r = qr_batched(a, interpret=not on_tpu)
        q64 = np.asarray(q).astype(np.float64)
        r64 = np.asarray(r).astype(np.float64)
        a64 = np.asarray(a).astype(np.float64)
        num = np.linalg.norm(q64 @ r64 - a64, axis=(1, 2))
        den = np.linalg.norm(a64, axis=(1, 2))
        rec["relerr_max"] = float((num / den).max())
    return rec


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", default="square", choices=["square", "tsqr", "batched", "baseline"])
    ap.add_argument("--sizes", default="1024,4096")
    ap.add_argument("--nbs", default="256")
    ap.add_argument("--ibs", default="32")
    ap.add_argument("--precisions", default="highest",
                    help="comma list of highest,b3,default")
    ap.add_argument("--method", default="hh", choices=["hh", "hr"],
                    help="square path: tiled Householder or CholeskyQR2+"
                    "Householder-reconstruction")
    ap.add_argument("--driver", default="static",
                    choices=["static", "dynamic", "chunked"],
                    help="hh: static/dynamic; hr: static/chunked")
    ap.add_argument("--strategy", default="tree",
                    choices=["tree", "chain", "cholqr2"],
                    help="tsqr mode only")
    ap.add_argument("--cols", type=int, default=512)
    ap.add_argument("--batch", type=int, default=4096)
    ap.add_argument("--chain", type=int, default=3)
    ap.add_argument("--chunk", type=int, default=4)
    ap.add_argument("--check", action="store_true", help="also compute relerr")
    ap.add_argument("--batched-method", default="hh", choices=["hh", "cholqr2"])
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (interpret-mode kernels); the "
                    "JAX_PLATFORMS env var is overridden by this image's TPU plugin")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    sizes = [int(s) for s in args.sizes.split(",")]
    for n in sizes:
        if args.mode == "square":
            for nb in [int(x) for x in args.nbs.split(",")]:
                for ib in [int(x) for x in args.ibs.split(",")]:
                    for prec in args.precisions.split(","):
                        print(json.dumps(bench_square(
                            n, nb, ib, prec, args.chain, args.check,
                            args.chunk, args.method, args.driver)), flush=True)
        elif args.mode == "baseline":
            print(json.dumps(bench_jnp_qr(n, args.chain)), flush=True)
        elif args.mode == "tsqr":
            for nb in [int(x) for x in args.nbs.split(",")]:
                for prec in args.precisions.split(","):
                    print(json.dumps(bench_tsqr(
                        n, args.cols, nb, args.chain, args.strategy,
                        args.check, prec)), flush=True)
        elif args.mode == "batched":
            print(json.dumps(bench_batched(args.batch, args.cols, args.chain, args.check, args.batched_method)), flush=True)


if __name__ == "__main__":
    main()
