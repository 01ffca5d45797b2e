"""Batched-path roofline push (VERDICT r1 next-#6): ib/group sweep at the
config-4 shape, kernel-only vs end-to-end split."""
import sys, time

sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp  # noqa: E402

from tileqr.drivers.batched import geqrt_batched_grouped, qr_batched  # noqa: E402

B, N = 4096, 128
rng = np.random.default_rng(0)
a = jnp.asarray(rng.standard_normal((B, N, N)).astype(np.float32))


def flops():
    return B * 2.0 * N * N * (N - N / 3.0)


def sync(r):
    _ = np.asarray(jax.tree_util.tree_leaves(r)[0].ravel()[0])


def timeit(mk):
    fk, f1 = mk(3), mk(1)
    sync(fk(a)); sync(f1(a))
    tk = min((lambda: (lambda t0: (sync(fk(a)), time.perf_counter() - t0)[1])(time.perf_counter()))() for _ in range(4))
    t1 = min((lambda: (lambda t0: (sync(f1(a)), time.perf_counter() - t0)[1])(time.perf_counter()))() for _ in range(4))
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


def mk_full(k):
    @jax.jit
    def f(x):
        for _ in range(k):
            q, r = qr_batched(x)
            x = q + r * jnp.float32(1e-9)
        return x
    return f


for g, ib in [(16, 32), (16, 64), (16, 128), (32, 128), (32, 64), (64, 128), (8, 128)]:
    try:
        t = timeit(mk_kernel(g, ib))
        print(f"grouped kernel g={g} ib={ib}: {t*1e3:.2f} ms  {flops()/t/1e12:.2f} TFLOP/s", flush=True)
    except Exception as e:
        print(f"grouped kernel g={g} ib={ib}: FAIL {type(e).__name__}: {str(e)[:200]}", flush=True)

t = timeit(lambda k: mk_full(k))
print(f"qr_batched end-to-end (current defaults): {t*1e3:.2f} ms  {flops()/t/1e12:.2f} TFLOP/s", flush=True)

# correctness spot check at the best kernel config is covered by qr_batched's
# own check below
q, r = qr_batched(a)
i = 5
q64 = np.asarray(q[i], np.float64); r64 = np.asarray(r[i], np.float64)
a64 = np.asarray(a[i], np.float64)
print(f"relerr[{i}] = {np.linalg.norm(q64 @ r64 - a64)/np.linalg.norm(a64):.2e}", flush=True)
