"""Staged-DMA grouped batched GEQRT prototype: dodge the g>16 Mosaic compile
crash by replacing pipelined in/out VMEM blocks with ANY-space + manual DMA
through a scratch; measures g in {16, 32, 64} at 4096x128^2."""
import sys, time, functools

sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

from tileqr.kernels.common import resolve_precision  # noqa: E402

B, N = 4096, 128
rng = np.random.default_rng(0)
a_host = rng.standard_normal((B, N, N)).astype(np.float32)
a = jnp.asarray(a_host)


def _mk_staged_kernel(g, n, m, ib, precision):
    def kernel(a_any, packed_any, t_ref, scr, sem):
        i = pl.program_id(0)
        cp = pltpu.make_async_copy(a_any.at[i], scr, sem)
        cp.start()
        cp.wait()
        dt = scr.dtype
        one = jnp.ones((), dt)
        zero = jnp.zeros((), dt)
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, 1, m), 2)
        lane_t = jax.lax.broadcasted_iota(jnp.int32, (1, 1, n), 2)
        t_ref[0] = jnp.zeros_like(t_ref[0])

        def bdot(x, y, contract):
            out = jax.lax.dot_general(
                x, y, dimension_numbers=((contract), ((0,), (0,))),
                precision=precision, preferred_element_type=jnp.float32,
            )
            return out.astype(dt)

        kcols = min(m, n)
        for s in range(0, kcols, ib):
            e = min(s + ib, kcols)
            ibk = e - s
            sub = jax.lax.broadcasted_iota(jnp.int32, (1, ibk, 1), 1)
            gid = s + sub

            def col_step(jj, _, s=s, e=e, ibk=ibk, sub=sub):
                j = s + jj
                xcol = scr[:, pl.ds(j, 1), :]
                alpha = jnp.sum(jnp.where(lane == j, xcol, zero), axis=2, keepdims=True)
                tailsq = jnp.sum(jnp.where(lane > j, xcol * xcol, zero), axis=2, keepdims=True)
                sgn = jnp.where(alpha >= 0, one, -one)
                nrm = jnp.sqrt(alpha * alpha + tailsq)
                has = tailsq > 0
                beta = jnp.where(has, -sgn * nrm, alpha)
                tau = jnp.where(has, (beta - alpha) / beta, zero)
                scale = jnp.where(has, 1 / (alpha - beta), zero)
                v = jnp.where(lane == j, one, jnp.where(lane > j, xcol * scale, zero))
                blk = scr[:, s:e, :]
                w = jnp.sum(blk * v, axis=2, keepdims=True)
                packed_j = jnp.where(lane == j, beta, jnp.where(lane > j, xcol * scale, xcol))
                scr[:, s:e, :] = jnp.where(
                    sub == jj, packed_j, blk - jnp.where(sub > jj, tau * w, zero) * v
                )
                t_ref[0, :, pl.ds(j, 1), :] = jnp.where(lane_t == j, tau, zero)
                return 0

            jax.lax.fori_loop(0, ibk, col_step, 0, unroll=False)

            blk_final = scr[:, s:e, :]
            vt_b = jnp.where(lane == gid, one, jnp.where(lane > gid, blk_final, zero))
            gmat = bdot(vt_b, vt_b, (((2,), (2,))))
            rows_b = jax.lax.broadcasted_iota(jnp.int32, (1, ibk, ibk), 1)
            cols_b = jax.lax.broadcasted_iota(jnp.int32, (1, ibk, ibk), 2)
            taus = jnp.sum(
                jnp.where(rows_b == cols_b, t_ref[0, :, s:e, s:e], zero),
                axis=2, keepdims=True,
            )
            ttb = jnp.where(rows_b == cols_b, taus, zero)
            bsz = 1
            while bsz < ibk:
                msk = ((cols_b // bsz) % 2 == 0) & (rows_b // bsz == cols_b // bsz + 1)
                gm = jnp.where(msk, gmat, zero)
                ttb = ttb - bdot(ttb, bdot(gm, ttb, (((2,), (1,)))), (((2,), (1,))))
                bsz *= 2
            t_ref[0, :, s:e, s:e] = ttb
            if e < n:
                at_rest = scr[:, e:, :]
                w1 = bdot(at_rest, vt_b, (((2,), (2,))))
                w2 = bdot(w1, ttb, (((2,), (2,))))
                scr[:, e:, :] = at_rest - bdot(w2, vt_b, (((2,), (1,))))
            if s > 0:
                sub_p = jax.lax.broadcasted_iota(jnp.int32, (1, s, 1), 1)
                vt_prev = jnp.where(
                    lane == sub_p, one,
                    jnp.where(lane > sub_p, scr[:, 0:s, :], zero),
                )
                zt = bdot(vt_b, vt_prev, (((2,), (2,))))
                m2 = bdot(zt, t_ref[0, :, 0:s, 0:s], (((2,), (1,))))
                t_ref[0, :, s:e, 0:s] = -bdot(ttb, m2, (((2,), (1,))))

        cp = pltpu.make_async_copy(scr, packed_any.at[i], sem)
        cp.start()
        cp.wait()

    return kernel


@functools.partial(jax.jit, static_argnames=("group", "ib", "precision"))
def geqrt_batched_staged(a, group=32, ib=32, precision="highest"):
    b, m, n = a.shape
    dt = a.dtype
    ng = b // group
    at = a.transpose(0, 2, 1).reshape(ng, group, n, m)
    prec = resolve_precision(precision)
    packed_t, t_t = pl.pallas_call(
        _mk_staged_kernel(group, n, m, ib, prec),
        grid=(ng,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_shape=(
            jax.ShapeDtypeStruct((ng, group, n, m), dt),
            jax.ShapeDtypeStruct((ng, group, n, n), dt),
        ),
        out_specs=(
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, group, n, n), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((group, n, m), dt),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=False,
    )(at)
    packed = packed_t.reshape(b, n, m).transpose(0, 2, 1)
    t = t_t.reshape(b, n, n).transpose(0, 2, 1)
    return packed, t


def flops():
    return B * 2.0 * N * N * (N - N / 3.0)


def sync(r):
    _ = np.asarray(jax.tree_util.tree_leaves(r)[0].ravel()[0])


def run_once(f):
    t0 = time.perf_counter()
    sync(f(a))
    return time.perf_counter() - t0


def timeit(g, ib):
    def mk(k):
        @jax.jit
        def f(x):
            for _ in range(k):
                p, t = geqrt_batched_staged(x, group=g, ib=ib)
                x = p + t[:, :1, :] * jnp.float32(1e-9)
            return x
        return f
    fk, f1 = mk(3), mk(1)
    sync(fk(a)); sync(f1(a))
    tk = min(run_once(fk) for _ in range(4))
    t1 = min(run_once(f1) for _ in range(4))
    return (tk - t1) / 2


# correctness first at g=16 vs numpy
p, t = geqrt_batched_staged(a, group=16, ib=32)
r0 = np.triu(np.asarray(p[3]))
rn = np.linalg.qr(a_host[3], mode="r")
s = np.sign(np.diag(rn)) * np.sign(np.diag(r0))
s[s == 0] = 1
print(f"staged g=16 R relerr vs numpy: {np.linalg.norm(r0 * s[:, None] - rn)/np.linalg.norm(rn):.2e}", flush=True)

for g, ib in [(16, 32), (32, 32), (64, 32), (32, 64), (64, 64), (128, 32)]:
    try:
        tt = timeit(g, ib)
        print(f"staged g={g} ib={ib}: {tt*1e3:.2f} ms  {flops()/tt/1e12:.2f} TFLOP/s", flush=True)
    except Exception as e:
        print(f"staged g={g} ib={ib}: FAIL {type(e).__name__}: {str(e)[:150]}", flush=True)
