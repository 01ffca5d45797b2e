import sys; sys.path.insert(0, "/root/repo")
import numpy as np, time, jax, jax.numpy as jnp
from tileqr.kernels.panel import panel_factor
from tileqr.kernels.chain import panel_chain, couple_strip, larfb_strip
from tileqr.drivers.square import _segments, _chunk_for

rng = np.random.default_rng(0)
def sync(r): _ = np.asarray(jax.tree_util.tree_leaves(r)[0].ravel()[0])
def run_once(f, x):
    t0 = time.perf_counter(); sync(f(x)); return time.perf_counter() - t0
size, nb, c = 8192, 256, 4
mt = size // nb
a0 = jnp.asarray(rng.standard_normal((size, size)).astype(np.float32))

def mk_panels(reps):
    @jax.jit
    def f(a):
        for _ in range(reps):
            for k in range(mt):
                n_head, base, nc = _segments(k, mt, c)
                a, r_k, tg_k, t2h = panel_factor(a, k, nb, n_couples=n_head)
                if nc > 0:
                    a, r_k, t2t = panel_chain(a, r_k, k, nb, base, nc, c * nb)
        return a
    return f

def mk_updates(reps):
    # k=0-shaped update repeated: larfb_strip + head(0) + chunks
    n_head, base, nc = _segments(0, mt, c)
    @jax.jit
    def f(a):
        a1, r_k, tg_k, t2h = panel_factor(a, 0, nb, n_couples=n_head)
        a1, r_k, t2t = panel_chain(a1, r_k, 0, nb, base, nc, c * nb)
        for _ in range(reps):
            strip = a1[0:nb, nb:]
            strip = larfb_strip(a1, tg_k, strip, 0, nb)
            a1, strip = couple_strip(a1, t2t, a1, strip, 0, base, nc, c * nb, nb, 1)
            a1 = jax.lax.dynamic_update_slice(a1, strip, (0, nb))
        return a1
    return f

for name, mk, reps in [("panels(all 32)", mk_panels, (2, 1)), ("update k=0 (31x7 chunks)", mk_updates, (4, 1))]:
    hi, lo = reps
    fh, fl = mk(hi), mk(lo)
    sync(fh(a0)); sync(fl(a0))
    th = min(run_once(fh, a0) for _ in range(3))
    tl = min(run_once(fl, a0) for _ in range(3))
    print(f"{name}: {(th-tl)/(hi-lo)*1e3:.2f} ms", flush=True)

# nb=384 error detail
try:
    from tileqr.drivers.square import qr_tiled
    out = qr_tiled(a0[:768, :768], 384, chunk=1)
    sync(out)
    print("nb=384 OK", flush=True)
except Exception as e:
    import traceback; traceback.print_exc()
print("DONE", flush=True)
