"""Probe: dynamic grid dims + scalar-prefetch index maps on Mosaic (jax 0.9).

If one Mosaic kernel can serve every panel k (grid sizes and block offsets as
runtime scalars), the 32768^2 driver compiles O(1) kernels instead of O(k)."""
import sys

sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")


def kernel(off_ref, x_ref, o_ref):
    o_ref[:] = x_ref[:] * 2.0


@jax.jit
def f(x, npt, off):
    # dynamic grid size (npt traced) + scalar-prefetch offset in the index map
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(npt,),
        in_specs=[pl.BlockSpec((128, 128), lambda i, off: (0, off[0] + i))],
        out_specs=pl.BlockSpec((128, 128), lambda i, off: (0, off[0] + i)),
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        input_output_aliases={1: 0},
    )(jnp.array([off], jnp.int32), x)


x = jnp.asarray(np.arange(128 * 1024, dtype=np.float32).reshape(128, 1024))
try:
    y = f(x, 3, 2)
    yn = np.asarray(y)
    xn = np.asarray(x)
    ok = (
        np.allclose(yn[:, 256:640], xn[:, 256:640] * 2)
        and np.allclose(yn[:, :256], xn[:, :256])
        and np.allclose(yn[:, 640:], xn[:, 640:])
    )
    print("dynamic grid + prefetch offset:", "OK" if ok else "WRONG RESULT")
    y2 = f(x, 5, 0)  # same executable, different runtime grid/offset
    ok2 = np.allclose(np.asarray(y2)[:, :640], xn[:, :640] * 2)
    print("reused executable with different npt/off:", "OK" if ok2 else "WRONG")
except Exception as e:
    print("FAILED:", type(e).__name__, str(e)[:500])
