"""Isolate the couple_strip update sweep (the flop-dominant kernel): measure
its standalone TFLOP/s at the 8192^2 k=0 shape to pin how much of the
~60%-of-ceiling update efficiency is the kernel itself vs driver glue."""
import sys, time

sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp  # noqa: E402

from tileqr.kernels.chain import couple_strip  # noqa: E402

N, nb, c = 8192, 256, 4
mt = N // nb
nc = (mt - 4) // c  # k=0, n_head=3 -> align=4 -> nc=7
pt = mt - 1
rng = np.random.default_rng(0)
a = jnp.asarray(rng.standard_normal((N, N)).astype(np.float32))
v = jnp.asarray(rng.standard_normal((nc, c * nb, nb)).astype(np.float32) * 0.1)
t2 = jnp.asarray(rng.standard_normal((nc, nb, nb)).astype(np.float32) * 0.1)
strip = jnp.asarray(rng.standard_normal((nb, pt * nb)).astype(np.float32))


def sync(r):
    _ = np.asarray(jax.tree_util.tree_leaves(r)[0].ravel()[0])


def mk(k):
    @jax.jit
    def f(x, s):
        for _ in range(k):
            x, s = couple_strip(v, t2, x, s, 0, 1, nc, c * nb, nb, 1,
                                trans=True, precision="highest")
        return x, s
    return f


fk, f1 = mk(3), mk(1)
sync(fk(a, strip)); sync(f1(a, strip))


def once(f):
    t0 = time.perf_counter(); sync(f(a, strip)); return time.perf_counter() - t0


tk = min(once(fk) for _ in range(5))
t1 = min(once(f1) for _ in range(5))
t = (tk - t1) / 2
# flops per (couple, coltile): W = T'(Ctop + V2'Cbot) -> 2*cnb*nb^2 + 2nb^3;
# Cbot -= V2 W -> 2*cnb*nb^2; Ctop -= W -> nb^2
fl = nc * pt * (4.0 * c * nb * nb * nb + 2.0 * nb**3)
print(f"couple_strip k=0 sweep: {t*1e3:.2f} ms  {fl/t/1e12:.2f} TFLOP/s "
      f"({fl/t/1e12/29*100:.0f}% of fp32-HIGHEST ceiling)", flush=True)
