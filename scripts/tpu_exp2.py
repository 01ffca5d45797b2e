import sys; sys.path.insert(0, "/root/repo")
import numpy as np, time, jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from tileqr.kernels.geqrt import geqrt_in_refs

nb = 256
def sync(r): _ = np.asarray(jax.tree_util.tree_leaves(r)[0].ravel()[0])
def run_once(f, x):
    t0 = time.perf_counter(); sync(f(x)); return time.perf_counter() - t0

# chain-step kernel on (nb, nb + c*nb) scratch: how does per-couple cost scale with c?
def mk(c, G):
    m_st = nb + c * nb
    def kern(a_ref, o_ref, at, vt, tt):
        at[:, :nb] = o_ref[:]  # fake carried R
        at[:, nb:] = a_ref[:].reshape(nb, c * nb)  # fake chunk load
        vt[:] = jnp.zeros_like(vt); tt[:] = jnp.zeros_like(tt)
        geqrt_in_refs(at, vt, tt, nb)
        o_ref[:] = at[:, :nb]
    @jax.jit
    def f(a):
        return pl.pallas_call(kern, grid=(G,),
            in_specs=[pl.BlockSpec((c * nb, nb), lambda i: (i % 4, 0), memory_space=pltpu.VMEM)],
            out_shape=jax.ShapeDtypeStruct((nb, nb), jnp.float32),
            out_specs=pl.BlockSpec((nb, nb), lambda i: (0, 0), memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((nb, m_st), jnp.float32)]*2 + [pltpu.VMEM((nb, nb), jnp.float32)])(a)
    return f

for c in [1, 2, 4, 8]:
    try:
        a = jnp.asarray(np.random.default_rng(0).standard_normal((4 * c * nb, nb)).astype(np.float32))
        f1, f2 = mk(c, 8), mk(c, 40)
        sync(f1(a)); sync(f2(a))
        t1 = min(run_once(f1, a) for _ in range(4))
        t2 = min(run_once(f2, a) for _ in range(4))
        per = (t2 - t1) / 32
        print(f"c={c}: {per*1e6:7.1f} us/couple  ({per/nb*1e9:.1f} ns/col)  -> chain cost factor {per/(c):.2f}x-per-tile-equiv", flush=True)
    except Exception as e:
        lines = [l for l in str(e).splitlines() if ('Mosaic' in l or 'implemented' in l or 'vmem' in l.lower() or 'exceed' in l.lower())][:2]
        print(f"c={c} FAILED {type(e).__name__} {lines}", flush=True)
print("DONE", flush=True)
