"""Blocked QR with CholeskyQR2 panels + Householder reconstruction
(``QRConfig.square_method="hr"`` — the matmul-only panel algorithm).

Round-2's measured conclusion (BASELINE.md): the trailing-update kernels run
at/above the fp32 matmul ceiling, and the whole remaining gap on the square
path is the latency-bound Householder panel column loop (~250–370 ns/column
× ~190 columns at 8192²). "The next frontier is a different panel
algorithm." This driver is that algorithm:

  1. Panel factor:  (Q, R) = CholeskyQR2(panel) — gram + grouped Pallas
     POTRF + log-doubling inverse + matmul-only orthogonality correction
     (drivers/cholqr.py). NO per-column work on the tall panel at all.
  2. Reconstruction: recover the compact-WY form from Q alone
     (kernels/modlu.py — Ballard/Demmel/Grigori/Knight identity):
         Q_top − diag(d) = L1·U   (modified LU, the ONLY serial step,
                                   nb×nb regardless of panel height)
         L2 = Q_bot·U⁻¹           (one tall matmul)
         Y  = [L1; L2],  T = −U·diag(d)·L1⁻ᵀ   (small matmuls; triangular
                                   inverses via the log-doubling identity)
     giving I − Y·T·Yᵀ orthogonal with (I − Y T Yᵀ)[:, :nb]·(d∘R) = panel.
  3. Trailing update: C ← C − Y·(Tᵀ·(Yᵀ·C)) — three large MXU matmuls at
     the configured precision ("highest" for the ≤1e-6 gate; "b3"/"high"
     trade ~10 bits for bf16x3 speed).

Everything the MXU sees is a big batched matmul; the single serial kernel
touches nb² elements per panel instead of the Householder loop's m_k·nb.

Conditioning contract (CholeskyQR territory, same as drivers/cholqr.py):
the first gram/Cholesky requires cond(panel)²·eps ≲ 1, i.e. cond ≲ 1e3 in
fp32. Trailing panels of a Householder-reduced matrix inherit A's
conditioning (orthogonal updates preserve singular values of the trailing
Schur complement), so the practical contract is cond(A) ≲ 1e3; outside it,
use the default unconditionally-stable Householder path
(square_method="hh").

Factor layout: per-panel (Y_k, T_k) with Y_k (M_pad − k·nb, nb) unit lower
trapezoidal and T_k (nb, nb) upper triangular — the LAPACK GEQRT contract
on whole panels instead of tiles.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from tileqr.drivers.cholqr import _triu_inv_doubling, cholqr2_batched
from tileqr.kernels.common import acc_type, resolve_precision
from tileqr.kernels.modlu import modified_lu


# targets at most this wide take the pairwise W projection in the XLA
# apply path (see _apply_block_t); wide trailing updates use the SPLIT-K
# form below instead — the batched-partial pairwise tree measured 2× slower
# at 16384² (474.97 vs 235.84 ms: the (nblk, be, p)×(nblk, be, q) batched
# matmul + 264 MB partial stacks break XLA's producer fusion), while S flat
# dots + a balanced add keep the fused-dot lowering (BASELINE.md r3).
_W_PAIR_MAX_COLS = 1024
# wide-W split count: error on the projection drops ~√S for S-1 extra
# (nb, q) partial buffers; 4 halves the √m term
_W_SPLITK = 4


def _w_splitk(y, c, prec, dt, s: int = None):
    """W = Yᵀ·C as S flat row-block dots + a balanced add tree: same HBM
    reads as one dot (each block dot reads its own row slice), fusion-
    friendly flat matmuls, accumulation error ~√(m/S) instead of √m."""
    m = y.shape[0]
    s = s or _W_SPLITK
    bounds = [((i * m) // s) // 8 * 8 for i in range(s)] + [m]
    parts = [
        jax.lax.dot_general(
            y[b0:b1], c[b0:b1], (((0,), (0,)), ((), ())),
            precision=prec, preferred_element_type=acc_type(dt),
        )
        for b0, b1 in zip(bounds[:-1], bounds[1:])
        if b1 > b0
    ]
    while len(parts) > 1:
        parts = [a + b for a, b in zip(parts[::2], parts[1::2])] + (
            [parts[-1]] if len(parts) % 2 else []
        )
    return parts[0].astype(dt)


def _dot(a, b, prec, dt):
    from tileqr.kernels.common import _EMULATED, dot_b3_xla

    if prec in _EMULATED and dt == jnp.float32:
        # barrier-protected split — the naive XLA-level emulation folds to
        # ONE bf16 pass under --xla_allow_excess_precision
        # (kernels/common.py _split_bf16_xla)
        return dot_b3_xla(
            a, b, (((1,), (0,)), ((), ())), _EMULATED[prec]
        ).astype(dt)
    if prec in _EMULATED:
        prec = jax.lax.Precision.HIGHEST
    return jnp.dot(a, b, precision=prec, preferred_element_type=acc_type(dt)).astype(dt)


def _reconstruct_yt(q, lu, d, dt):
    """(Y, T) from the panel's orthonormal Q and its top-block modified LU.

    All matmuls pinned HIGHEST: Y/T define the factorization itself (the
    same argument as cholqr.py's Q1 note — a bf16 pass here pollutes the
    reflector space with an error the trailing updates cannot remove)."""
    hi = jax.lax.Precision.HIGHEST
    nb = lu.shape[0]
    eye = jnp.eye(nb, dtype=dt)
    l1 = jnp.tril(lu, -1) + eye
    u = jnp.triu(lu)
    # U⁻¹ and L1⁻ᵀ = (L1ᵀ)⁻¹: both upper triangular → log-doubling inverse
    # (matmul-only; U's pivots are in [1, 2] by the sign modification, so
    # the inverse is well-conditioned)
    uinv = _triu_inv_doubling(u[None], hi)[0]
    l1tinv = _triu_inv_doubling(jnp.transpose(l1)[None], hi)[0]
    l2 = _dot(q[nb:], uinv, hi, dt)
    y = jnp.concatenate([l1, l2], axis=0)
    t = -_dot(u * d[None, :], l1tinv, hi, dt)
    return y, t


# panel pipeline default: "fused" folds the Q formation and the R gram
# away (4 tall passes over the panel instead of 6 — see hr_panel_fused);
# "classic" is the straight cholqr2_batched → modified-LU composition the
# fused form was A/B'd against.
_PANEL_PIPELINE = "fused"


def hr_panel(panel, interpret, correction_iters: int = 2, stats: bool = False,
             pipeline: str | None = None):
    """Factor one (mk, nb) panel: returns (y (mk, nb), t (nb, nb),
    r (nb, nb) with the reconstruction signs folded in). stats=True appends
    the panel's CholeskyQR round-1 orthogonality defect ‖Q₁ᵀQ₁ − I‖_max —
    the hr breakdown signal (see cholqr2_batched)."""
    if (pipeline or _PANEL_PIPELINE) == "fused":
        return hr_panel_fused(panel, interpret, correction_iters, stats)
    dt = panel.dtype
    out = cholqr2_batched(
        panel[None], mode="reduced", group=1, precision="highest",
        interpret=interpret, correction_iters=correction_iters, stats=stats,
    )
    q, r = out[0][0], out[1][0]
    lu, d = modified_lu(q[: r.shape[0]], interpret=interpret)
    y, t = _reconstruct_yt(q, lu, d, dt)
    rk = d[:, None] * r
    return (y, t, rk, out[2]) if stats else (y, t, rk)


def hr_panel_fused(panel, interpret, correction_iters: int = 2,
                   stats: bool = False):
    """hr panel with the minimal number of tall passes over the panel.

    The phase-split probe (scripts/tpu_r3_hr_tune.py panels8k) measured the
    PANEL phase at 20.5 ms of the 8192² static driver's 38.4 — the tall
    (m_k × nb) matmuls of the classic cholqr2→modLU composition, not the
    trailing updates, had become the bottleneck. The classic pipeline makes
    SIX passes over the panel: gram, Q₁ = P·S₁, the correction gram Q₁ᵀQ₁,
    Q = Q₁·W, R = QᵀP, and L2 = Q[nb:]·U⁻¹. Three of those are algebraically
    redundant given the nb×nb intermediates already in hand:

      - Q is never needed: modified-LU only reads Q_top = Q₁[:nb]·W (nb³),
        and Y's bottom is Q[nb:]·U⁻¹ = Q₁[nb:]·(W·U⁻¹) — fold the two nb×nb
        factors first and make ONE tall pass.
      - R = QᵀP = Wᵀ·(Q₁ᵀP) and Q₁ᵀP = S₁ᵀ·(PᵀP) = S₁ᵀ·G — pure nb³ off the
        gram. (The r_anchor A/B, BASELINE.md r3, showed the hr residual
        floor does not live in the R anchor; measured again for this form —
        relerr unchanged at 8192².)

    What stays measured: the correction gram E = Q₁ᵀQ₁ − I. Its algebraic
    twin S₁ᵀGS₁ − I misses Q₁'s own formation rounding — exactly the defect
    the correction round and the breakdown monitor exist to see.

    Four tall passes total (gram, Q₁, E, Y-bottom); the two reconstruction
    triangular inverses run as one B=2 log-doubling batch. Same contract
    and return layout as the classic pipeline."""
    from tileqr.drivers.cholqr import _up_half, bdot_pair_rows, potrf_batched

    dt = panel.dtype
    hi = jax.lax.Precision.HIGHEST
    nb = panel.shape[1]
    eye = jnp.eye(nb, dtype=dt)
    g = bdot_pair_rows(panel[None], panel[None], hi, dt)  # tall pass 1
    r1 = potrf_batched(g, group=1, precision="highest", interpret=interpret)
    s1 = _triu_inv_doubling(r1, hi)[0]
    q1 = _dot(panel, s1, hi, dt)  # tall pass 2
    e = bdot_pair_rows(q1[None], q1[None], hi, dt)[0] - eye  # tall pass 3
    if stats:
        emax = jnp.where(
            jnp.any(jnp.isnan(e)), jnp.asarray(jnp.nan, dt),
            jnp.max(jnp.abs(e)),
        )
    # matmul-only second round (cholqr2_batched's algebra, B=1 inline):
    # chol(I+E) = I + U by the quadratic iteration, (I+U)⁻¹ by Horner
    u = _up_half(e[None])[0]
    for _ in range(correction_iters):
        u = _up_half((e - _dot(jnp.transpose(u), u, hi, dt))[None])[0]
    w = eye - u
    w = eye - _dot(u, w, hi, dt)
    w = eye - _dot(u, w, hi, dt)
    q_top = _dot(q1[:nb], w, hi, dt)
    lu, d = modified_lu(q_top, interpret=interpret)
    l1 = jnp.tril(lu, -1) + eye
    uu = jnp.triu(lu)
    invs = _triu_inv_doubling(jnp.stack([uu, jnp.transpose(l1)]), hi)
    uuinv, l1tinv = invs[0], invs[1]
    l2 = _dot(q1[nb:], _dot(w, uuinv, hi, dt), hi, dt)  # tall pass 4
    y = jnp.concatenate([l1, l2], axis=0)
    t = -_dot(uu * d[None, :], l1tinv, hi, dt)
    r = jnp.triu(_dot(jnp.transpose(w), _dot(jnp.transpose(s1), g[0], hi, dt), hi, dt))
    rk = d[:, None] * r
    return (y, t, rk, emax) if stats else (y, t, rk)


def _apply_block_t(y, t, c, prec, dt, trans: bool, interpret: bool = False):
    """C ← (I − Y·T·Yᵀ)ᵀ C (trans) or (I − Y·T·Yᵀ) C (no trans).

    For precision="b3" on nb-aligned shapes this routes through the Pallas
    whole-panel kernel (kernels/panel_apply.py): the XLA-level 3-dot
    emulation cannot win on this tall-thin shape — the three dots are
    separate HLO ops re-reading HBM with materialized split operands
    (measured 20.2 TFLOP/s vs highest's 31.9 on the 8192-row update),
    while the in-kernel split reuses VMEM blocks across the passes
    (47.4 TFLOP/s — BASELINE.md r3). Unaligned shapes (vector apply_q
    targets, reduced-ncols orgqr windows) fall back to the mask-protected
    XLA emulation (kernels/common.dot_b3_xla): correct b3 accuracy, no
    speed claim."""
    from tileqr.kernels.common import _EMULATED as _EMU

    if prec in _EMU and dt == jnp.float32:
        m, nb = y.shape
        n = c.shape[1]
        if n and m % nb == 0 and n % nb == 0:
            from tileqr.kernels.panel_apply import panel_apply

            return panel_apply(
                y, t, c, trans=trans, precision=prec, interpret=interpret
            )
    if prec not in _EMU and y.shape[0] >= 2048 and c.shape[1] <= _W_PAIR_MAX_COLS:
        # narrow tall targets (lstsq/Qᵀb, orgqr windows, vector applies):
        # pairwise block accumulation of W = YᵀC kills the √m term of the
        # apply chain's error (BASELINE.md r3 pairwise probe V4) for a few
        # MB of block partials — cheap at this width, unjustified on the
        # wide trailing update (which the Kahan-compensated Pallas kernel
        # covers instead).
        from tileqr.drivers.cholqr import bdot_pair_rows

        w = bdot_pair_rows(y[None], c[None], prec, dt)[0]
    elif prec not in _EMU and dt == jnp.float32 and y.shape[0] >= 4096:
        # wide trailing updates / wide applies: split-K projection (see
        # _w_splitk) — the V2/V4 accumulation fix at fused-dot speed
        w = _w_splitk(y, c, prec, dt)
    else:
        w = _dot(jnp.transpose(y), c, prec, dt)
    tm = jnp.transpose(t) if trans else t
    w = _dot(tm, w, prec, dt)
    return c - _dot(y, w, prec, dt)


@functools.partial(
    jax.jit,
    static_argnames=(
        "nb", "precision", "interpret", "barrier_every", "r_anchor", "stats",
    ),
)
def qr_hr(
    ap,
    nb: int,
    precision: str = "highest",
    interpret: bool = False,
    barrier_every: int = 8,
    r_anchor: str = "cholqr",
    stats: bool = False,
):
    """Blocked hr QR of a padded (Mp, Np) matrix (both multiples of nb;
    column padding must be identity-augmented — see pad_for_hr).

    r_anchor selects where panel k's R(k,k) diagonal block comes from:
      "cholqr" (default): CholeskyQR2's R (= triu(QᵀA) with the corrected Q,
        signs folded).
      "panel": apply the reconstructed block reflector to the panel's OWN
        columns and take triu of the top block — the hh driver's R
        materialization. MEASURED A WASH (BASELINE.md r3): 8192² relerr
        7.31e-07 vs cholqr's 7.38e-07 at a ~2% wall cost (extra nb-wide
        update strip) — the hr residual floor is the per-panel
        apply-chain/orthogonality rounding, not the R anchor. Kept for the
        A/B record.

    Returns (r (K, Np) with K = min(Mp, Np), panels tuple of (Y_k, T_k));
    stats=True appends ``health`` = max over panels of the CholeskyQR
    round-1 orthogonality defect (hr breakdown signal — NaN/huge on a
    panel whose cond²·eps ≳ 1; see cholqr2_batched). The (r, panels)
    outputs are bitwise-unchanged by stats (the defect is a pure
    observer reduce on an already-computed intermediate)."""
    mp, npad = ap.shape
    if mp % nb or npad % nb:
        raise ValueError(f"padded shape {ap.shape} not a multiple of nb={nb}")
    if r_anchor not in ("panel", "cholqr"):
        raise ValueError(f"r_anchor={r_anchor!r} must be panel|cholqr")
    dt = ap.dtype
    prec = resolve_precision(precision)
    k_max = min(mp, npad) // nb
    # R rows land in a preallocated buffer via dynamic_update_slice, NOT a
    # final concat of per-panel slices: the concat form keeps EVERY
    # trailing-matrix temp alive until the end (each contributes its first
    # nb rows), Σ(N−k·nb)² ≈ N³/(3nb) bytes — 23 GB at 16384², measured
    # HBM OOM. With the eager copy-out, only two consecutive trailing
    # matrices are ever live.
    r = jnp.zeros((k_max * nb, npad), dt)
    trail, r, panels, health = _hr_body(
        ap, r, nb, 0, k_max, prec, dt, interpret, barrier_every, r_anchor,
        stats=stats,
    )
    if stats:
        return r, tuple(panels), health
    return r, tuple(panels)


def _hr_body(trail, r, nb, k0, kseg, prec, dt, interpret, barrier_every,
             r_anchor, stats=False):
    """Factor panels [k0, k0+kseg) of ``trail`` (the trailing window whose
    top-left corner is global (k0·nb, k0·nb)), writing finished R rows into
    the full-width ``r`` buffer at their global offsets. Returns the
    remaining trailing window, the updated r, the panel list, and the
    running health max (None unless stats)."""
    panels = []
    health = None
    for i in range(kseg):
        k = k0 + i
        if stats:
            y, t, rk, emax = hr_panel(trail[:, :nb], interpret, stats=True)
            health = emax if health is None else jnp.maximum(health, emax)
        else:
            y, t, rk = hr_panel(trail[:, :nb], interpret)
        if r_anchor == "panel":
            c = _apply_block_t(y, t, trail, prec, dt, trans=True, interpret=interpret)
            row = jnp.concatenate([jnp.triu(c[:nb, :nb]), c[:nb, nb:]], axis=1)
            trail = c[nb:, nb:]
        else:
            c = _apply_block_t(y, t, trail[:, nb:], prec, dt, trans=True, interpret=interpret)
            row = jnp.concatenate([rk, c[:nb]], axis=1)
            trail = c[nb:]
        r = jax.lax.dynamic_update_slice(r, row, (k * nb, k * nb))
        # every ``barrier_every`` panels, pin the R-row copy-outs BEFORE the
        # next panel starts: the latency-hiding scheduler otherwise defers
        # all the small R updates to the end, keeping every shrinking
        # trailing temp alive at once — Σ(N−k·nb)² ≈ N³/(3nb) bytes, a
        # measured compile-time HBM OOM at 16384² despite the eager
        # dynamic_update_slice form. A barrier on EVERY panel (the safe
        # choice) also serializes the panel/update overlap XLA's async
        # scheduling provides. Measured at 16384²: every panel 296.4 ms,
        # every 4th 245.6, every 8th 238.9 (84.6% of the fp32 ceiling),
        # every 16th 378.6 (peak temps ≈ 15 GB — HBM pressure stalls);
        # 8 is the shipped default.
        if (k + 1) % max(1, barrier_every) == 0:
            trail, r = jax.lax.optimization_barrier((trail, r))
        panels.append((y, t))
    return trail, r, panels, health


@functools.partial(
    jax.jit,
    static_argnames=(
        "nb", "k0", "kseg", "precision", "interpret", "barrier_every",
        "r_anchor", "use_kernel", "stats",
    ),
    donate_argnums=(0,),
)
def _hr_segment(carry, nb, k0, kseg, precision, interpret, barrier_every,
                r_anchor, use_kernel=False, stats=False, health=None):
    """Factor panels [k0, k0+kseg) inside the full-size carry matrix. The
    carry is the SINGLE (Mp, Np) buffer and the ONLY loop state: finished R
    row blocks live at their global offsets (stale A values left of the
    diagonal — removed by the caller's final triu), the active trailing
    window at (k·nb, k·nb) is read through fused slices and written back
    per panel. Keeping no separate trail value matters twice at 32768²:
    (a) full-shape in/out keeps the donated carry aliasable (a shrinking
    trail output cannot alias its larger input), and (b) the live set is
    carry + ONE window temp ≈ 8 GiB instead of carry + two evolving
    windows ≈ 12 GiB — the trail-carrying design rode at ~97% of HBM,
    where it intermittently ResourceExhausted and, when it ran, crawled at
    6.89 TFLOP/s (allocator pressure; BASELINE.md r3)."""
    if use_kernel and r_anchor != "cholqr":
        raise ValueError("use_kernel supports r_anchor='cholqr' only")
    prec = resolve_precision(precision)
    dt = carry.dtype
    panels = []
    rks = []

    def panel_stats(pcol):
        nonlocal health
        if stats:
            y, t, rk, emax = hr_panel(pcol, interpret, stats=True)
            health = emax if health is None else jnp.maximum(health, emax)
            return y, t, rk
        return hr_panel(pcol, interpret)

    for i in range(kseg):
        k = k0 + i
        s = k * nb
        if use_kernel:
            # in-place windowed Pallas apply: reads the panel column through
            # one small slice, updates carry[s:, s+nb:] with NO window
            # slice/update-slice copies (kernels/panel_apply.py
            # panel_apply_carry — the value-level form pays ~4 extra HBM
            # passes per panel). The nb² diagonal R blocks are NOT written
            # into the carry here: a dynamic_update_slice whose output
            # feeds a must-alias pallas call makes XLA copy the whole
            # carry to satisfy the aliasing — the blocks ride a small
            # per-segment stack instead and qr_hr_chunked merges them at
            # the end. Block-accumulated reduction ⇒ values agree with the
            # XLA path to fp32 rounding, not bitwise.
            from tileqr.kernels.panel_apply import panel_apply_carry

            y, t, rk = panel_stats(carry[s:, s : s + nb])
            carry = panel_apply_carry(
                y, t, carry, k=k, nb=nb, trans=True, precision=precision,
                interpret=interpret,
            )
            rks.append(rk)
            if (k + 1) % max(1, barrier_every) == 0:
                carry = jax.lax.optimization_barrier(carry)
            panels.append((y, t))
            continue
        win = carry[s:, s:]
        y, t, rk = panel_stats(win[:, :nb])
        if r_anchor == "panel":
            c = _apply_block_t(y, t, win, prec, dt, trans=True, interpret=interpret)
            row = jnp.concatenate([jnp.triu(c[:nb, :nb]), c[:nb, nb:]], axis=1)
            low = c[nb:, nb:]
        else:
            c = _apply_block_t(y, t, win[:, nb:], prec, dt, trans=True, interpret=interpret)
            row = jnp.concatenate([rk, c[:nb]], axis=1)
            low = c[nb:]
        carry = jax.lax.dynamic_update_slice(carry, row, (s, s))
        carry = jax.lax.dynamic_update_slice(carry, low, (s + nb, s + nb))
        if (k + 1) % max(1, barrier_every) == 0:
            carry = jax.lax.optimization_barrier(carry)
        panels.append((y, t))
    rstack = jnp.stack(rks) if rks else None
    return carry, tuple(panels), rstack, health


def qr_hr_chunked(
    ap,
    nb: int,
    precision: str = "highest",
    interpret: bool = False,
    seg_panels: int = 8,
    barrier_every: int = 2,
    r_anchor: str = "cholqr",
    use_kernel=None,
    stats: bool = False,
):
    """Bounded-compile hr driver: same algorithm and factor layout as
    ``qr_hr``, but the panel loop is split into ``seg_panels``-panel
    segments, each its OWN small jitted executable with the carry matrix
    donated between them. Compile cost is O(k_max / seg_panels) small
    programs instead of one k_max-panel giant: the trace-unrolled ``qr_hr``
    at 32768² (128 panels) SIGKILLs this environment's remote compile
    helper (BASELINE.md r3 — the XLA buffer-assignment pass OOMs on the
    ~5000-op program with 4 GiB temps), while each segment here is an
    8-panel program that compiles in seconds. No flop waste, no masking —
    shapes shrink at segment boundaries exactly as the static driver's do.
    R rides INSIDE the carry (row blocks at their global offsets) so the
    donated buffer aliases in/out at full shape; the final triu strips the
    stale below-diagonal values. The barrier_every default is 2 (not 8):
    segments are their own materialization points, and at 32768² two live
    4 GiB trailing temps are the HBM budget.

    DONATES ``ap`` (and reuses it as the carry) — callers keep their
    original unpadded array; ``pad_for_hr`` always allocates a fresh
    padded buffer. With ``use_kernel=False`` (the XLA apply) the returned
    (r, panels) are BITWISE-equal to ``qr_hr`` (pinned by test); the r5
    default in-kernel apply (``use_kernel=None`` → True for b3/b4/highest
    fp32 with the cholqr anchor) matches ``qr_hr`` to rounding only
    (~1e-4 max elementwise on gaussian 1e0-scale inputs, same backward-
    error class — pinned by test), because the kernel's Kahan-blocked W
    accumulation orders the sums differently."""
    mp, npad = ap.shape
    if mp % nb or npad % nb:
        raise ValueError(f"padded shape {ap.shape} not a multiple of nb={nb}")
    if use_kernel is None:
        # the Pallas in-place apply is what makes the emulated modes
        # (b3/b4) actually FAST (the XLA-level emulation loses to highest
        # on this shape, BASELINE.md r3) — and since r5 it is the default
        # for "highest" too: the aliased in-place kernel carries no barrier
        # temps (the XLA form's extra HBM traffic cost 1.62× at 16384² and
        # OOMed the 32768² warm run, VERDICT r4 missing-#1/weak-#1; the
        # kernel A/B is in BASELINE.md r5). fp32 only — f64 (CPU/interpret
        # oracles) has no Mosaic lowering and stays on the XLA dots.
        use_kernel = (
            precision in ("b3", "b4", "highest")
            and ap.dtype == jnp.float32
            # the kernel apply only implements the cholqr R anchor; the
            # r_anchor="panel" A/B knob must keep working through the
            # chunked route (it is the only hr route past 64 panels)
            and r_anchor == "cholqr"
        )
    k_max = min(mp, npad) // nb
    carry = ap
    panels = []
    rstacks = []
    k0 = 0
    # health folds INSIDE each segment executable (one jnp.maximum chain per
    # segment, seeded with 0 so every segment shares one jit signature) —
    # no per-segment eager dispatches through the device tunnel
    health = jnp.zeros((), ap.dtype) if stats else None
    while k0 < k_max:
        kseg = min(seg_panels, k_max - k0)
        carry, seg, rstack, health = _hr_segment(
            carry, nb=nb, k0=k0, kseg=kseg, precision=precision,
            interpret=interpret, barrier_every=barrier_every,
            r_anchor=r_anchor, use_kernel=use_kernel, stats=stats,
            health=health,
        )
        panels.extend(seg)
        if rstack is not None:
            rstacks.append(rstack)
        k0 += kseg
    # Donation pays only when R has the carry's shape (square input after
    # padding): XLA reuses the carry's buffer for R, halving the warm-run
    # HBM residue at 32768² (r4 requal OOM). For rectangular inputs the
    # output shape differs, the alias is impossible, and routing through a
    # donated jit just emits a 'donated buffers were not usable'
    # UserWarning on every call (ADVICE r4 #1) — take the undonated twin.
    square = k_max * nb == mp
    if rstacks:
        # kernel path: the diagonal R blocks were stashed per segment (a
        # per-panel dynamic_update_slice into the carry would make XLA copy
        # the whole carry to satisfy the next pallas call's must-alias) —
        # merge them into the final R under one jit
        fin = _finish_r_kernel if square else _finish_r_kernel_nodonate
        r = fin(carry, jnp.concatenate(rstacks), nb, k_max)
    else:
        r = (_finish_r_plain if square else _finish_r_plain_nodonate)(
            carry, k_max * nb
        )
    if stats:
        return r, tuple(panels), health
    return r, tuple(panels)


def _finish_r_plain_impl(carry, k_rows: int):
    return jnp.triu(carry[:k_rows])


_finish_r_plain = jax.jit(
    _finish_r_plain_impl, static_argnames=("k_rows",), donate_argnums=(0,)
)
_finish_r_plain_nodonate = jax.jit(
    _finish_r_plain_impl, static_argnames=("k_rows",)
)


def _finish_r_kernel_impl(carry, rstack, nb, k_max):
    r = jnp.triu(carry[: k_max * nb])

    def body(k, r):
        return jax.lax.dynamic_update_slice(r, rstack[k], (k * nb, k * nb))

    return jax.lax.fori_loop(0, k_max, body, r)


_finish_r_kernel = jax.jit(
    _finish_r_kernel_impl, static_argnames=("nb", "k_max"), donate_argnums=(0,)
)
_finish_r_kernel_nodonate = jax.jit(
    _finish_r_kernel_impl, static_argnames=("nb", "k_max")
)


@functools.partial(
    jax.jit, static_argnames=("nb", "trans", "precision", "interpret")
)
def apply_q_hr(
    panels: Tuple, c, nb: int, trans: bool = False,
    precision: str = "highest", interpret: bool = False,
):
    """C ← Q C (or Qᵀ C) from hr factors. c: (Mp, P), Mp the padded rows."""
    dt = c.dtype
    prec = resolve_precision(precision)
    order = range(len(panels)) if trans else reversed(range(len(panels)))
    for k in order:
        y, t = panels[k]
        s = k * nb
        cs = _apply_block_t(y, t, c[s:], prec, dt, trans=trans, interpret=interpret)
        c = jnp.concatenate([c[:s], cs], axis=0) if s else cs
    return c


@functools.partial(
    jax.jit,
    static_argnames=("nb", "k0", "trans", "precision", "interpret"),
    donate_argnums=(1,),
)
def _apply_segment(panels, c, nb, k0, trans, precision, interpret):
    dt = c.dtype
    prec = resolve_precision(precision)
    order = range(len(panels)) if trans else reversed(range(len(panels)))
    for i in order:
        y, t = panels[i]
        s = (k0 + i) * nb
        cs = _apply_block_t(y, t, c[s:], prec, dt, trans=trans, interpret=interpret)
        c = jnp.concatenate([c[:s], cs], axis=0) if s else cs
    return c


def apply_q_hr_chunked(
    panels: Tuple, c, nb: int, trans: bool = False,
    precision: str = "highest", interpret=None, seg_panels: int = 8,
):
    """Bounded-compile twin of ``apply_q_hr``: the panel loop is cut into
    ``seg_panels``-panel jitted segments with the target donated between
    them — the trace-unrolled apply at 128 panels grows the same class of
    program that SIGKILLed the factor's compile (BASELINE.md r3). Segments
    run forward for Qᵀ (trans) and reversed for Q. Same values as
    apply_q_hr (identical op sequence, just cut at jit boundaries).
    DONATES ``c`` — callers pass a fresh target (api.apply_q pads into
    one)."""
    from tileqr.kernels.common import resolve_interpret as _ri

    interpret = _ri(interpret)
    k_max = len(panels)
    bounds = list(range(0, k_max, seg_panels)) + [k_max]
    segs = list(zip(bounds[:-1], bounds[1:]))
    if not trans:
        segs = list(reversed(segs))
    for ks, ke in segs:
        c = _apply_segment(
            tuple(panels[ks:ke]), c, nb=nb, k0=ks, trans=trans,
            precision=precision, interpret=interpret,
        )
    return c


@functools.partial(
    jax.jit, static_argnames=("mp", "nb", "ncols", "precision", "interpret")
)
def orgqr_hr(
    panels: Tuple, mp: int, nb: int, ncols: int,
    precision: str = "highest", interpret: bool = False,
):
    """Form Q (Mp × ncols) with the xORGQR growing window: accumulating in
    reverse panel order, panel k only touches rows/columns ≥ k·nb (columns
    left of the panel are still exact unit vectors, on which Yᵀe_c = 0), so
    the working window grows from the last panel's corner instead of
    carrying the full matrix through every panel."""
    dt = panels[0][0].dtype
    prec = resolve_precision(precision)
    # panels at or beyond ncols are exact no-ops on Q's columns
    k_used = min(len(panels), -(-ncols // nb))
    s_last = (k_used - 1) * nb
    w = jnp.eye(mp - s_last, ncols - s_last, dtype=dt)
    w = _apply_block_t(*panels[k_used - 1], w, prec, dt, trans=False, interpret=interpret)
    for k in reversed(range(k_used - 1)):
        rows, cols = w.shape
        w = jnp.block(
            [
                [jnp.eye(nb, dtype=dt), jnp.zeros((nb, cols), dt)],
                [jnp.zeros((rows, nb), dt), w],
            ]
        )
        w = _apply_block_t(*panels[k], w, prec, dt, trans=False, interpret=interpret)
    return w


def pad_for_hr(a, nb: int, row_mult: int | None = None, col_mult: int | None = None):
    """Pad (M, N) to nb multiples for the hr driver. Zero ROW padding is
    exact (zero rows contribute nothing to panel grams). Zero COLUMN padding
    would make the last panel's gram singular, so padded columns carry an
    α·identity block on otherwise-zero padding rows (α an exact power of two
    near max|A|): the gram becomes block-diagonal and well-conditioned, the
    padded columns factor to exact unit reflectors, and R's real block is
    untouched (later columns never influence earlier panels).

    row_mult/col_mult override the padding multiples (default nb both) —
    the sharded hr driver pads to nb·pr / nb·pc so the block-cyclic local
    matrices are uniform across the mesh."""
    from tileqr.core.layout import round_up

    m, n = a.shape
    np_ = round_up(n, col_mult or nb)
    col_pad = np_ - n
    mp = round_up(m + col_pad, row_mult or nb) if col_pad else round_up(m, row_mult or nb)
    ap = jnp.pad(a, ((0, mp - m), (0, col_pad)))
    if col_pad:
        amax = jnp.max(jnp.abs(a))
        alpha = jnp.where(
            amax > 0,
            jnp.exp2(
                jnp.minimum(
                    jnp.ceil(jnp.log2(jnp.maximum(amax, jnp.finfo(a.dtype).tiny))),
                    float(jnp.finfo(a.dtype).maxexp - 1),
                )
            ),
            jnp.ones((), a.dtype),
        ).astype(a.dtype)
        rows = jnp.arange(mp)[:, None]
        cols = jnp.arange(np_)[None, :]
        ap = jnp.where(
            (cols >= n) & (rows == cols - n + m), alpha, ap
        )
    return ap, (m, n)
