"""A/B the GEQRT column-loop variants in isolation (chained executables).

Variants of the per-tile factorization, all on a 256x256 tile:
  cur     : shipped geqrt_in_refs (slim loop + post-loop gram/doubling T)
  no_t    : slim loop, T skipped entirely (lower bound for the loop itself)
  ib64/128: shipped, wider inner block (fewer post-loop T builds + MXU
            applies, same column count)
"""
import sys

sys.path.insert(0, "/root/repo")
import numpy as np, time, jax, jax.numpy as jnp  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from tileqr.kernels.geqrt import geqrt_in_refs  # noqa: E402

NB = 256
rng = np.random.default_rng(0)


def sync(r):
    _ = np.asarray(jax.tree_util.tree_leaves(r)[0].ravel()[0])


def run_once(f, x):
    t0 = time.perf_counter()
    sync(f(x))
    return time.perf_counter() - t0


def chain_time(make, x, k, reps=3):
    fk, f1 = make(k), make(1)
    sync(fk(x))
    sync(f1(x))
    tk = min(run_once(fk, x) for _ in range(reps))
    t1 = min(run_once(f1, x) for _ in range(reps))
    return (tk - t1) / (k - 1)


def slim_no_t(at_ref, tt_ref, kcols, ib=32):
    """Column loop only, no T build at all (lower bound)."""
    n, m = at_ref.shape
    dt = at_ref.dtype
    one, zero = jnp.ones((), dt), jnp.zeros((), dt)
    lane_r = jax.lax.broadcasted_iota(jnp.int32, (1, m), 1)
    for s in range(0, kcols, ib):
        ibk = min(ib, kcols - s)
        sub_b = jax.lax.broadcasted_iota(jnp.int32, (ibk, 1), 0)

        def col_step(jj, _, s=s, ibk=ibk, sub_b=sub_b):
            j = s + jj
            xrow = at_ref[pl.ds(j, 1), :]
            alpha = jnp.sum(jnp.where(lane_r == j, xrow, zero), axis=1, keepdims=True)
            tailsq = jnp.sum(jnp.where(lane_r > j, xrow * xrow, zero), axis=1, keepdims=True)
            sgn = jnp.where(alpha >= 0, one, -one)
            nrm = jnp.sqrt(alpha * alpha + tailsq)
            has = tailsq > 0
            beta = jnp.where(has, -sgn * nrm, alpha)
            tau = jnp.where(has, (beta - alpha) / beta, zero)
            scale = jnp.where(has, 1 / (alpha - beta), zero)
            v = jnp.where(lane_r == j, one, jnp.where(lane_r > j, xrow * scale, zero))
            blk = at_ref[s : s + ibk, :]
            w = jnp.sum(blk * v, axis=1, keepdims=True)
            packed_j = jnp.where(lane_r == j, beta, jnp.where(lane_r > j, xrow * scale, xrow))
            at_ref[s : s + ibk, :] = jnp.where(
                sub_b == jj, packed_j, blk - jnp.where(sub_b > jj, tau * w, zero) * v
            )
            return 0

        jax.lax.fori_loop(0, ibk, col_step, 0, unroll=False)
        # block apply to the rest so inter-block data flow matches (V recon)
        if s + ibk < n:
            gid = s + jax.lax.broadcasted_iota(jnp.int32, (ibk, 1), 0)
            rows = at_ref[s : s + ibk, :]
            vt_b = jnp.where(lane_r == gid, one, jnp.where(lane_r > gid, rows, zero))
            rest = at_ref[s + ibk :, :]
            w1 = jax.lax.dot_general(rest, vt_b, (((1,), (1,)), ((), ())),
                                     precision=jax.lax.Precision.HIGHEST,
                                     preferred_element_type=jnp.float32).astype(dt)
            at_ref[s + ibk :, :] = rest - jnp.dot(
                w1, vt_b, precision=jax.lax.Precision.HIGHEST,
                preferred_element_type=jnp.float32).astype(dt)


def mk_kernel(body, ib):
    def kern(a_ref, o_ref, at_scr, tt_scr):
        at_scr[:] = a_ref[:].T
        tt_scr[:] = jnp.zeros_like(tt_scr)
        body(at_scr, tt_scr, NB, ib=ib)
        o_ref[:] = at_scr[:].T

    return kern


def mk_chain(body, ib):
    call = lambda a: pl.pallas_call(  # noqa: E731
        mk_kernel(body, ib),
        out_shape=jax.ShapeDtypeStruct((NB, NB), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((NB, NB), jnp.float32), pltpu.VMEM((NB, NB), jnp.float32)],
    )(a)

    def make(k):
        @jax.jit
        def f(x):
            for _ in range(k):
                x = call(x)
            return x

        return f

    return make


a = jnp.asarray(rng.standard_normal((NB, NB)).astype(np.float32))
for name, body, ib in [
    ("cur ib=32", geqrt_in_refs, 32),
    ("no_t ib=32", slim_no_t, 32),
    ("cur ib=64", geqrt_in_refs, 64),
    ("cur ib=128", geqrt_in_refs, 128),
    ("no_t ib=128", slim_no_t, 128),
]:
    t = chain_time(mk_chain(body, ib), a, 32, reps=3)
    print(f"{name}: {t*1e6:.1f} us/tile ({t/NB*1e9:.0f} ns/col)", flush=True)
