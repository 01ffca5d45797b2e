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


def bench_square(n, nb, ib, precision, chain, check, chunk=4):
    from tileqr.drivers.square import apply_q_tiled, assemble_r, qr_tiled

    on_tpu = jax.default_backend() == "tpu"
    a = jnp.asarray(np.random.default_rng(0).standard_normal((n, n)).astype(np.float32))

    def make(k):
        @jax.jit
        def f(x):
            for _ in range(k):
                x = qr_tiled(x, nb, ib=ib, chunk=chunk, precision=precision, interpret=not on_tpu)[0]
            return x

        return f

    t = per_iter(make, a, chain)
    rec = {
        "bench": "qr_square", "n": n, "nb": nb, "ib": ib, "chunk": chunk,
        "precision": precision, "ms": round(t * 1e3, 6),
        "tflops": round(qr_flops(n, n) / t / 1e12, 9),
        "backend": jax.default_backend(),
    }
    if check:
        packed, r_diag, t_geqrt, panels = qr_tiled(
            a, nb, ib=ib, chunk=chunk, precision=precision, interpret=not on_tpu
        )
        r = np.asarray(assemble_r(packed, r_diag, nb)).astype(np.float64)
        qta = np.asarray(
            apply_q_tiled(panels, t_geqrt, a, nb, chunk=chunk, trans=True,
                          precision=precision, interpret=not on_tpu)
        ).astype(np.float64)
        rec["relerr"] = float(np.linalg.norm(qta - r) / np.linalg.norm(np.asarray(a)))
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


def bench_tsqr(m, cols, nb, chain):
    from tileqr.drivers.tsqr import tsqr_factor

    on_tpu = jax.default_backend() == "tpu"
    a = jnp.asarray(np.random.default_rng(0).standard_normal((m, cols)).astype(np.float32))

    def make(k):
        @jax.jit
        def f(x):
            r = None
            for _ in range(k):
                r = tsqr_factor(x, nb, interpret=not on_tpu).r
                x = x + r[0, 0] * jnp.float32(1e-9)
            return x

        return f

    t = per_iter(make, a, chain)
    return {
        "bench": "tsqr", "m": m, "n": cols, "nb": nb, "ms": round(t * 1e3, 6),
        "tflops": round(qr_flops(m, cols) / t / 1e12, 9),
        "backend": jax.default_backend(),
    }


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
    ap.add_argument("--precisions", default="highest")
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
                        print(json.dumps(bench_square(n, nb, ib, prec, args.chain, args.check, args.chunk)), flush=True)
        elif args.mode == "baseline":
            print(json.dumps(bench_jnp_qr(n, args.chain)), flush=True)
        elif args.mode == "tsqr":
            for nb in [int(x) for x in args.nbs.split(",")]:
                print(json.dumps(bench_tsqr(n, args.cols, nb, args.chain)), flush=True)
        elif args.mode == "batched":
            print(json.dumps(bench_batched(args.batch, args.cols, args.chain, args.check, args.batched_method)), flush=True)


if __name__ == "__main__":
    main()
