"""Batched follow-up: g sweep at ib=32, XLA vec path, crash repro."""
import sys, time

sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp  # noqa: E402

from tileqr.drivers.batched import (  # noqa: E402
    geqrt_batched_grouped,
    geqrt_batched_vec,
)

B, N = 4096, 128
rng = np.random.default_rng(0)
a = jnp.asarray(rng.standard_normal((B, N, N)).astype(np.float32))


def flops():
    return B * 2.0 * N * N * (N - N / 3.0)


def sync(r):
    _ = np.asarray(jax.tree_util.tree_leaves(r)[0].ravel()[0])


def run_once(f):
    t0 = time.perf_counter()
    sync(f(a))
    return time.perf_counter() - t0


def timeit(mk):
    fk, f1 = mk(3), mk(1)
    sync(fk(a)); sync(f1(a))
    tk = min(run_once(fk) for _ in range(4))
    t1 = min(run_once(f1) for _ in range(4))
    return (tk - t1) / 2


def mk_kernel(g, ib):
    def make(k):
        @jax.jit
        def f(x):
            for _ in range(k):
                p, t = geqrt_batched_grouped(x, group=g, ib=ib)
                x = p + t[:, :1, :] * jnp.float32(1e-9)
            return x
        return f
    return make


def mk_vec(ib):
    def make(k):
        @jax.jit
        def f(x):
            for _ in range(k):
                p, t = geqrt_batched_vec(x, ib=ib)
                x = p + t[:, :1, :] * jnp.float32(1e-9)
            return x
        return f
    return make


for g, ib in [(32, 32), (64, 32), (128, 32), (32, 16), (16, 128)]:
    try:
        t = timeit(mk_kernel(g, ib))
        print(f"grouped g={g} ib={ib}: {t*1e3:.2f} ms  {flops()/t/1e12:.2f} TFLOP/s", flush=True)
    except Exception as e:
        print(f"grouped g={g} ib={ib}: FAIL {type(e).__name__}: {str(e)[:150]}", flush=True)

for ib in [32, 64]:
    try:
        t = timeit(mk_vec(ib))
        print(f"vec (pure XLA) ib={ib}: {t*1e3:.2f} ms  {flops()/t/1e12:.2f} TFLOP/s", flush=True)
    except Exception as e:
        print(f"vec ib={ib}: FAIL {type(e).__name__}: {str(e)[:150]}", flush=True)
