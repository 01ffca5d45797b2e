"""Round-3 (cont.): micro-split of the hr fused-panel cost on the chip.

The fused-panel A/B (BASELINE.md r3) showed the static hr full-run critical
path is the per-panel small-op chain (potrf, modified-LU, doubling inverses,
~30 nb³ dots), not the tall passes. Before fusing that chain into a single
Pallas nb²-state kernel, measure where the ~575 us/panel actually goes:

  panel   — hr_panel_fused on an (m, 256) panel, chained differencing
  gram    — ONE tall pass (bdot_pair_rows gram) on the same panel
  tdot    — ONE tall dot P @ S (m×nb · nb×nb), the q1/l2 pass shape
  potrf   — potrf_batched B=1 on a fixed nb² gram
  modlu   — modified_lu on an nb² block
  inv1/2  — _triu_inv_doubling B=1 / B=2 (8 doubling steps of nb³ dots)
  dot     — one nb³ HIGHEST dot (the unit of the remaining ~20-op chain)
  smalls  — the full post-E small-op chain (correction + modLU + invs + T
            + R off the gram) as one jitted function of nb² inputs

Chaining keeps a data dependence by folding a 1e-30-scaled output element
back into the input (same trick as tpu_r3_hr.bench).

Usage: python scripts/tpu_r3_panel_micro.py [m]   (default m=8192)
"""
import sys, time

sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import tileqr.drivers.square_hr as shr  # noqa: E402
from tileqr.drivers.cholqr import (  # noqa: E402
    _triu_inv_doubling, _up_half, bdot_pair_rows, potrf_batched,
)
from tileqr.kernels.modlu import modified_lu  # noqa: E402

NB = 256
HI = jax.lax.Precision.HIGHEST


def sync(r):
    _ = np.asarray(jax.tree_util.tree_leaves(r)[0].ravel()[0])


def run_once(f, x):
    t0 = time.perf_counter()
    sync(f(x))
    return time.perf_counter() - t0


def chained(body, x, k=16, reps=5):
    """per-iter wall of `body` by (T_k - T_1)/(k - 1) differencing.

    r4 fix: the nb² bodies are single-digit µs while the tunnel's dispatch
    jitter is ~±0.5-2 ms, so k must be large enough that (k-1)·body ≫
    jitter (the r3/early-r4 runs at k ≤ 64 produced NEGATIVE differences).
    The chain runs as a fori_loop (O(1) compile at any k) with the
    1e-30-scaled output element folded into the carry to keep a data
    dependence between iterations."""

    def mk(kk):
        @jax.jit
        def f(x):
            def it(_, xc):
                out = body(xc)
                leaf = jax.tree_util.tree_leaves(out)[0]
                return xc + (leaf.ravel()[0] * jnp.float32(1e-30)).astype(
                    xc.dtype
                )

            return jax.lax.fori_loop(0, kk, it, x, unroll=False)

        return f

    fk, f1 = mk(k), mk(1)
    sync(fk(x)), sync(f1(x))
    tk = min(run_once(fk, x) for _ in range(reps))
    t1 = min(run_once(f1, x) for _ in range(reps))
    return (tk - t1) / (k - 1)


def smalls_chain(args):
    """Everything hr_panel_fused does between the E tall pass and the l2
    tall pass, plus the R anchor: the candidate body for a fused Pallas
    nb²-state kernel. Inputs are the nb² intermediates already in hand."""
    g, s1, e, q1top = args
    dt = g.dtype
    eye = jnp.eye(NB, dtype=dt)
    u = _up_half(e[None])[0]
    for _ in range(2):
        u = _up_half((e - jnp.dot(u.T, u, precision=HI))[None])[0]
    w = eye - u
    w = eye - jnp.dot(u, w, precision=HI)
    w = eye - jnp.dot(u, w, precision=HI)
    q_top = jnp.dot(q1top, w, precision=HI)
    lu, d = modified_lu(q_top, interpret=False)
    l1 = jnp.tril(lu, -1) + eye
    uu = jnp.triu(lu)
    invs = _triu_inv_doubling(jnp.stack([uu, l1.T]), HI)
    uuinv, l1tinv = invs[0], invs[1]
    fold = jnp.dot(w, uuinv, precision=HI)
    t = -jnp.dot(uu * d[None, :], l1tinv, precision=HI)
    r = jnp.triu(jnp.dot(w.T, jnp.dot(s1.T, g, precision=HI), precision=HI))
    rk = d[:, None] * r
    return l1, t, rk, fold


def main(m):
    key = jax.random.PRNGKey(0)
    panel = jax.jit(
        lambda: jax.random.normal(key, (m, NB), jnp.float32)
    )()
    sync(panel)
    g = jax.jit(lambda p: bdot_pair_rows(p[None], p[None], HI, jnp.float32)[0])(
        panel
    )
    r1 = jax.jit(
        lambda gg: potrf_batched(gg[None], group=1, precision="highest")[0]
    )(g)
    s1 = jax.jit(lambda rr: _triu_inv_doubling(rr[None], HI)[0])(r1)
    q1 = jax.jit(lambda p, s: jnp.dot(p, s, precision=HI))(panel, s1)
    e = jax.jit(
        lambda q: bdot_pair_rows(q[None], q[None], HI, jnp.float32)[0]
        - jnp.eye(NB, dtype=jnp.float32)
    )(q1)
    sync(e)

    rows = []

    def rec(name, val_us):
        rows.append((name, val_us))
        print(f"{name:8s} {val_us:9.1f} us", flush=True)

    rec("panel", chained(
        lambda p: shr.hr_panel_fused(p, False), panel, k=64) * 1e6)
    rec("gram", chained(
        lambda p: bdot_pair_rows(p[None], p[None], HI, jnp.float32)[0],
        panel, k=256) * 1e6)
    rec("tdot", chained(
        lambda p: jnp.dot(p, s1, precision=HI), panel, k=256) * 1e6)
    rec("potrf", chained(
        lambda gg: potrf_batched(gg[None], group=1, precision="highest")[0],
        g, k=512) * 1e6)
    rec("modlu", chained(
        lambda q: modified_lu(q, interpret=False)[0], q1[:NB], k=512) * 1e6)
    rec("inv1", chained(
        lambda rr: _triu_inv_doubling(rr[None], HI)[0], r1, k=256) * 1e6)
    # both doubling inputs upper-triangular, as at the real call site
    # ([uu, l1.T]) — rr.T would be lower-triangular (values meaningless for
    # that routine, and this is a values-could-be-reused trap even though
    # the fixed doubling-step matmul count makes the timing identical)
    rec("inv2", chained(
        lambda rr: _triu_inv_doubling(jnp.stack([rr, rr]), HI)[0],
        r1, k=256) * 1e6)
    rec("dot", chained(
        lambda gg: jnp.dot(gg, s1, precision=HI), g, k=1024) * 1e6)

    def smalls_body(gg):
        # every closed-over nb² input is perturbed by the chained value so
        # ALL four sub-chains (l1/t/rk/fold) are live AND loop-variant —
        # selecting one output of constant inputs lets XLA CSE the k
        # iterations into one and DCE the rest (the r3 'smalls' reading
        # measured ~nothing; ADVICE r3)
        eps = (gg.ravel()[0] * jnp.float32(1e-30)).astype(gg.dtype)
        l1, t, rk, fold = smalls_chain((gg, s1 + eps, e + eps, q1[:NB] + eps))
        return (l1.ravel()[0] + t.ravel()[0] + rk.ravel()[0]
                + fold.ravel()[0])[None]

    rec("smalls", chained(smalls_body, g, k=128) * 1e6)

    tall = rows[1][1] * 2 + rows[2][1] * 2  # gram+E, q1+l2
    print(f"\nsum check: 4 tall passes ~{tall:.0f} us; potrf+inv1 "
          f"{rows[3][1] + rows[5][1]:.0f} us; smalls {rows[8][1]:.0f} us; "
          f"panel total {rows[0][1]:.0f} us")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 8192)
