"""A/B: fused next-column carry in the GEQRT column loop.

The serial chain per column today: [store blk] -> load xrow -> alpha/tailsq
lane reductions -> scalar chain -> v -> w reduce -> [store]. The fused
variant extracts the next column's row and its norms from the UPDATED block
while it is still in registers (masked sublane reduce), carrying
(xrow, alpha, tailsq) through the fori_loop — the store->load round trip and
the leading reductions leave the critical path.
"""
import sys, time, functools

sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

from tileqr.kernels.geqrt import geqrt_in_refs  # noqa: E402


def geqrt_in_refs_fused(at_ref, tt_ref, kcols, ib=128,
                        precision=jax.lax.Precision.HIGHEST):
    n, m = at_ref.shape
    dt = at_ref.dtype
    one = jnp.ones((), dt)
    zero = jnp.zeros((), dt)
    lane_r = jax.lax.broadcasted_iota(jnp.int32, (1, m), 1)

    def contract_lanes(a, b):
        out = jax.lax.dot_general(
            a, b, dimension_numbers=(((1,), (1,)), ((), ())),
            precision=precision, preferred_element_type=jnp.float32,
        )
        return out.astype(dt)

    def recon_vt(rows_slice, row0, nrows):
        gid = row0 + jax.lax.broadcasted_iota(jnp.int32, (nrows, 1), 0)
        return jnp.where(lane_r == gid, one, jnp.where(lane_r > gid, rows_slice, zero))

    lane_t = jax.lax.broadcasted_iota(jnp.int32, (1, n), 1)

    for s in range(0, kcols, ib):
        ibk = min(ib, kcols - s)
        sub_b = jax.lax.broadcasted_iota(jnp.int32, (ibk, 1), 0)
        gid_b = s + sub_b

        x0 = at_ref[pl.ds(s, 1), :]
        a0 = jnp.sum(jnp.where(lane_r == s, x0, zero), axis=1, keepdims=True)
        t0 = jnp.sum(jnp.where(lane_r > s, x0 * x0, zero), axis=1, keepdims=True)

        def col_step(jj, carry, s=s, ibk=ibk, sub_b=sub_b):
            xrow, alpha, tailsq = carry
            j = s + jj
            sgn = jnp.where(alpha >= 0, one, -one)
            nrm = jnp.sqrt(alpha * alpha + tailsq)
            has_tail = tailsq > 0
            beta = jnp.where(has_tail, -sgn * nrm, alpha)
            tau = jnp.where(has_tail, (beta - alpha) / beta, zero)
            scale = jnp.where(has_tail, 1 / (alpha - beta), zero)
            v = jnp.where(lane_r == j, one, jnp.where(lane_r > j, xrow * scale, zero))
            blk = at_ref[s : s + ibk, :]
            w = jnp.sum(blk * v, axis=1, keepdims=True)
            packed_j = jnp.where(lane_r == j, beta, jnp.where(lane_r > j, xrow * scale, xrow))
            updated = jnp.where(
                sub_b == jj, packed_j, blk - jnp.where(sub_b > jj, tau * w, zero) * v
            )
            at_ref[s : s + ibk, :] = updated
            tt_ref[pl.ds(j, 1), :] = jnp.where(lane_t == j, tau, zero)
            xn = jnp.sum(jnp.where(sub_b == jj + 1, updated, zero), axis=0, keepdims=True)
            an = jnp.sum(jnp.where(lane_r == j + 1, xn, zero), axis=1, keepdims=True)
            tn = jnp.sum(jnp.where(lane_r > j + 1, xn * xn, zero), axis=1, keepdims=True)
            return xn, an, tn

        jax.lax.fori_loop(0, ibk, col_step, (x0, a0, t0), unroll=False)

        vt_b = recon_vt(at_ref[s : s + ibk, :], s, ibk)
        g = contract_lanes(vt_b, vt_b)
        taus = jnp.sum(
            jnp.where(
                gid_b == jax.lax.broadcasted_iota(jnp.int32, (ibk, ibk), 1) + s,
                tt_ref[s : s + ibk, s : s + ibk], zero,
            ),
            axis=1, keepdims=True,
        )
        rows_b = jax.lax.broadcasted_iota(jnp.int32, (ibk, ibk), 0)
        cols_b = jax.lax.broadcasted_iota(jnp.int32, (ibk, ibk), 1)
        ttb = jnp.where(rows_b == cols_b, taus, zero)
        bsz = 1
        while bsz < ibk:
            mask = ((cols_b // bsz) % 2 == 0) & (rows_b // bsz == cols_b // bsz + 1)
            gm = jnp.where(mask, g, zero)
            ttb = ttb - jnp.dot(
                ttb, jnp.dot(gm, ttb, precision=precision, preferred_element_type=jnp.float32).astype(dt),
                precision=precision, preferred_element_type=jnp.float32,
            ).astype(dt)
            bsz *= 2
        tt_ref[s : s + ibk, s : s + ibk] = ttb
        tt_bb = ttb
        if s + ibk < n:
            at_rest = at_ref[s + ibk :, :]
            w1 = contract_lanes(at_rest, vt_b)
            w2 = contract_lanes(w1, tt_bb)
            at_ref[s + ibk :, :] = at_rest - jnp.dot(
                w2, vt_b, precision=precision, preferred_element_type=jnp.float32
            ).astype(dt)
        if s > 0:
            vt_prev = recon_vt(at_ref[0:s, :], 0, s)
            zt = contract_lanes(vt_b, vt_prev)
            m2 = jnp.dot(zt, tt_ref[0:s, 0:s], precision=precision,
                         preferred_element_type=jnp.float32).astype(dt)
            tt_ref[s : s + ibk, 0:s] = -jnp.dot(
                tt_bb, m2, precision=precision, preferred_element_type=jnp.float32
            ).astype(dt)


def mk_call(body, mrows, n, ib):
    def kernel(a_ref, packed_ref, t_ref, at_scr, tt_scr):
        at_scr[:] = a_ref[:].T
        tt_scr[:] = jnp.zeros_like(tt_scr)
        body(at_scr, tt_scr, n, ib=ib)
        packed_ref[:] = at_scr[:].T
        t_ref[:] = tt_scr[:].T

    @jax.jit
    def call(a):
        return pl.pallas_call(
            kernel,
            out_shape=(
                jax.ShapeDtypeStruct((mrows, n), a.dtype),
                jax.ShapeDtypeStruct((n, n), a.dtype),
            ),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=(
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ),
            scratch_shapes=[
                pltpu.VMEM((n, mrows), a.dtype),
                pltpu.VMEM((n, n), a.dtype),
            ],
        )(a)

    return call


def sync(r):
    _ = np.asarray(jax.tree_util.tree_leaves(r)[0].ravel()[0])


def chained(call, a, k=17):
    def mk(kk):
        @jax.jit
        def f(x):
            for _ in range(kk):
                p, t = call(x)
                x = p + t[0, 0] * jnp.float32(1e-9)
            return x
        return f
    fk, f1 = mk(k), mk(1)
    sync(fk(a)); sync(f1(a))
    def once(f):
        t0 = time.perf_counter(); sync(f(a)); return time.perf_counter() - t0
    tk = min(once(fk) for _ in range(4))
    t1 = min(once(f1) for _ in range(4))
    return (tk - t1) / (k - 1)


rng = np.random.default_rng(0)
for mrows, n, ib in [(256, 256, 128), (2048, 256, 128), (256, 256, 64)]:
    a = jnp.asarray(rng.standard_normal((mrows, n)).astype(np.float32))
    base = mk_call(geqrt_in_refs, mrows, n, ib)
    fuse = mk_call(geqrt_in_refs_fused, mrows, n, ib)
    pb, tb = base(a)
    pf, tf = fuse(a)
    same = (np.asarray(pb) == np.asarray(pf)).all() and (np.asarray(tb) == np.asarray(tf)).all()
    tb_ = chained(base, a)
    tf_ = chained(fuse, a)
    print(f"({mrows},{n}) ib={ib}: base {tb_*1e6:.1f} us, fused {tf_*1e6:.1f} us "
          f"({tb_/tf_:.2f}x), bitwise_equal={same}", flush=True)
