"""Round-3 experiment: WHERE does the hr residual's sqrt(m) growth live?

hr's measured backward error grows like sqrt(m) (7.3e-07 at 8192^2 ->
1.16e-06 at 16384^2) while the hh driver's stays flat (3.0e-07 -> 3.5e-07).
The structural difference: every hr contraction runs over the WHOLE panel
height m (panel gram, Q1 orthogonality gram, final R = Q^T A, update
projection W = Y^T C), while hh only ever contracts 2*nb=512-row couples.
Hypothesis: the sqrt(m) term is the sequential fp32 block accumulation of
those tall contractions, and PAIRWISE (binary tree) block accumulation --
error ~ sqrt(log m) instead of sqrt(m) -- removes it.

This probe A/Bs value-level pairwise accumulation (block partials via a
batched HIGHEST matmul + tree sum; memory-hungry but exact in structure) in
each location independently:

  V0 base factor            + base residual apply   (sanity: ~7.3e-07)
  V1 pairwise PANEL grams   + base apply            (panel-side source?)
  V2 pairwise update W      + base apply            (update-side source?)
  V3 both                   + base apply
  V4 both                   + pairwise apply        (measurement apply too)

If V3/V4 land well under the 1e-6 gate at 16384^2, the production fix is
Kahan/pairwise accumulation inside kernels/panel_apply.py's W scratch loop
(one extra VMEM scratch + 3 VPU ops per block) plus a pairwise gram, and hr
becomes acceptance-grade at its 24.5 TFLOP/s.
"""
import sys
import time

sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from tileqr.drivers.cholqr import (  # noqa: E402
    _triu_inv_doubling,
    _up_half,
    potrf_batched,
)
from tileqr.drivers.square_hr import (  # noqa: E402
    _apply_block_t,
    _reconstruct_yt,
    hr_panel,
)
from tileqr.kernels.common import resolve_interpret  # noqa: E402
from tileqr.kernels.modlu import modified_lu  # noqa: E402

HI = jax.lax.Precision.HIGHEST
BLK = 512
INTERP = resolve_interpret(None)  # auto: compiled on TPU, interpret on CPU


def dot_tall_pair(a, b):
    """a^T . b with pairwise (binary-tree) block accumulation: block
    partials from a batched HIGHEST matmul, then tree-summed in fp32."""
    m, p = a.shape
    q = b.shape[1]
    nblk = m // BLK
    rem = m - nblk * BLK
    pa = a[: nblk * BLK].reshape(nblk, BLK, p)
    pb = b[: nblk * BLK].reshape(nblk, BLK, q)
    parts = jax.lax.dot_general(
        pa, pb, (((1,), (1,)), ((0,), (0,))), precision=HI,
        preferred_element_type=jnp.float32,
    )
    if rem:
        tail = jax.lax.dot_general(
            a[nblk * BLK :], b[nblk * BLK :], (((0,), (0,)), ((), ())),
            precision=HI, preferred_element_type=jnp.float32,
        )
        parts = jnp.concatenate([parts, tail[None]], 0)
    while parts.shape[0] > 1:
        n2 = parts.shape[0] // 2
        summed = parts[0 : 2 * n2 : 2] + parts[1 : 2 * n2 : 2]
        parts = (
            jnp.concatenate([summed, parts[2 * n2 :]], 0)
            if parts.shape[0] % 2
            else summed
        )
    return parts[0].astype(a.dtype)


def cholqr2_pair(panel, correction_iters=2):
    """cholqr2_batched's pipeline for ONE tall panel with pairwise grams
    (the tall contractions: A^T A, Q1^T Q1, final Q^T A)."""
    dt = panel.dtype
    n = panel.shape[1]
    eye = jnp.eye(n, dtype=dt)
    g = dot_tall_pair(panel, panel)
    r1 = potrf_batched(g[None], group=1, precision="highest", interpret=INTERP)[0]
    s1 = _triu_inv_doubling(r1[None], HI)[0]
    q1 = jnp.dot(panel, s1, precision=HI, preferred_element_type=jnp.float32).astype(dt)
    e = dot_tall_pair(q1, q1) - eye
    u = _up_half(e[None])[0]
    for _ in range(correction_iters):
        utu = jnp.dot(u.T, u, precision=HI, preferred_element_type=jnp.float32).astype(dt)
        u = _up_half((e - utu)[None])[0]
    w = eye - u
    w = eye - jnp.dot(u, w, precision=HI, preferred_element_type=jnp.float32).astype(dt)
    w = eye - jnp.dot(u, w, precision=HI, preferred_element_type=jnp.float32).astype(dt)
    q = jnp.dot(q1, w, precision=HI, preferred_element_type=jnp.float32).astype(dt)
    r = dot_tall_pair(q, panel)
    r = jnp.triu(r)
    return q, r


def hr_panel_pair(panel):
    dt = panel.dtype
    q, r = cholqr2_pair(panel)
    lu, d = modified_lu(q[: r.shape[0]], interpret=INTERP)
    y, t = _reconstruct_yt(q, lu, d, dt)
    return y, t, d[:, None] * r


def apply_block_pair(y, t, c, trans):
    """(I - Y T Y^T)^{T?} C with the tall projection W = Y^T C pairwise."""
    dt = c.dtype
    w = dot_tall_pair(y, c)
    tm = jnp.transpose(t) if trans else t
    w = jnp.dot(tm, w, precision=HI, preferred_element_type=jnp.float32).astype(dt)
    return c - jnp.dot(y, w, precision=HI, preferred_element_type=jnp.float32).astype(dt)


def qr_hr_probe(ap, nb, panel_pair: bool, w_pair: bool, barrier_every=8):
    mp, npad = ap.shape
    dt = ap.dtype
    k_max = min(mp, npad) // nb
    r = jnp.zeros((k_max * nb, npad), dt)
    trail = ap
    panels = []
    for k in range(k_max):
        if panel_pair:
            y, t, rk = hr_panel_pair(trail[:, :nb])
        else:
            y, t, rk = hr_panel(trail[:, :nb], INTERP)
        if w_pair:
            c = apply_block_pair(y, t, trail[:, nb:], trans=True)
        else:
            c = _apply_block_t(y, t, trail[:, nb:], HI, dt, trans=True)
        row = jnp.concatenate([rk, c[:nb]], axis=1)
        trail = c[nb:]
        r = jax.lax.dynamic_update_slice(r, row, (k * nb, k * nb))
        if (k + 1) % barrier_every == 0:
            trail, r = jax.lax.optimization_barrier((trail, r))
        panels.append((y, t))
    return r, tuple(panels)


def apply_q_probe(panels, c, nb, pair: bool):
    dt = c.dtype
    for k in reversed(range(len(panels))):
        y, t = panels[k]
        s = k * nb
        if pair:
            cs = apply_block_pair(y, t, c[s:], trans=False)
        else:
            cs = _apply_block_t(y, t, c[s:], HI, dt, trans=False)
        c = jnp.concatenate([c[:s], cs], axis=0) if s else cs
    return c


def sync(x):
    _ = np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[0])


def run(n, nb, variants):
    a = jax.jit(
        lambda: jax.random.normal(jax.random.PRNGKey(0), (n, n), jnp.float32)
    )()
    sync(a)

    for name, ppair, wpair, apair in variants:
        @jax.jit
        def resid(x, ppair=ppair, wpair=wpair, apair=apair):
            r, panels = qr_hr_probe(x, nb, ppair, wpair)
            qr_prod = apply_q_probe(panels, r, nb, apair)
            return jnp.linalg.norm((qr_prod - x).astype(jnp.float32)) / jnp.linalg.norm(x)

        t0 = time.perf_counter()
        rel = float(resid(a))
        print(
            f"{n}^2 nb={nb} {name}: relerr {rel:.3e} "
            f"(compile+run {time.perf_counter()-t0:.0f} s)",
            flush=True,
        )


ALL = [
    ("V0 base", False, False, False),
    ("V1 panel-pair", True, False, False),
    ("V2 W-pair", False, True, False),
    ("V3 both", True, True, False),
    ("V4 both+apply-pair", True, True, True),
]

if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "8k"
    names = sys.argv[2].split(",") if len(sys.argv) > 2 else None
    vs = [v for v in ALL if names is None or v[0].split()[0] in names]
    if which == "8k":
        run(8192, 256, vs)
    elif which == "16k":
        run(16384, 256, vs)
    elif which == "4k":
        run(4096, 256, vs)
    elif which == "1k":
        run(1024, 256, vs)
