"""GEQRT — panel/tile QR factorization kernel (reference component C1).

The reference's GEQRT is a CUDA kernel factorizing one diagonal nb×nb tile in
shared memory with sequential Householder columns and compact-WY V/T
accumulation [SURVEY.md §2.1 C1, BASELINE.json:5]. The TPU-native equivalent
keeps the whole tile resident in VMEM and runs the column loop as a
``lax.fori_loop`` over a *transposed* scratch copy of the tile: with matrix
columns along sublanes and matrix rows along lanes, every per-column
operation — column extraction, masked norm, rank-1 trailing update, packed
write-back, incremental T row — is a sublane-dynamic ref slice
(``ref[pl.ds(j, 1), :]``) or a lane reduction, both cheap on the VPU.
(Lane-dimension dynamic indexing, which a row-major layout would need, is
expensive on TPU, and Mosaic does not lower ``dynamic_slice`` on register
values at all — hence scratch refs.)

No separate V scratch is kept: a reflector row is reconstructed exactly from
the packed tile on demand (v_r = unit at lane r, packed row r beyond lane r)
with iota masks — VMEM is the scarce resource (16 MB scoped limit on v5e)
and the reconstruction is one extra masked pass.

``geqrt_in_refs`` is the core primitive of the whole library: TSQRT and
TTQRT (components C3/C5) are GEQRT on a stacked couple whose masked-out zero
structure the body handles for free, and the batched path grids over it.

Math contract (ref/tile_ops.py:geqrt, LAPACK xLARFG/xLARFT semantics):
  beta = -sign(alpha) * ||x||;  v = x/(alpha-beta), v0 = 1;
  tau = (beta-alpha)/beta;  T[j,j] = tau;  T[:j,j] = -tau T[:j,:j] (Vᵀ v_j).

Input-magnitude limit: the column norm is computed as sqrt(alpha² + Σx²) in
the working dtype with NO xLARFG-style rescaling — fp32 columns whose entries
exceed ~1e19 in magnitude (norm² > fp32 max ≈ 3.4e38) overflow to inf.
Rescaling would put a max-abs reduction + multiply on the latency-bound
serial column path to guard a regime ~1e16× beyond the benchmark data range;
callers with extreme-scale data should use ``QRConfig(prescale=True)``
(api.py: one exact power-of-2 matrix prescale outside the kernels, factors
bitwise-identical on non-overflowing data) or pre-scale manually (QR commutes
with scalar scaling: QR(cA) = (Q, cR)).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tileqr.kernels.common import acc_type, resolve_interpret


def geqrt_in_refs(
    at_ref,
    tt_ref,
    kcols: int,
    ib: int = 128,
    precision=jax.lax.Precision.HIGHEST,
    lane_extent=None,
) -> None:
    """Factor the tile held transposed in ``at_ref`` in place.

    at_ref: (n, m) VMEM scratch holding Aᵀ (sublane j = column j of A);
      on exit holds packedᵀ (R above the diagonal of A, v's below).
    tt_ref: (n, n) VMEM scratch, must be zeroed; on exit holds Tᵀ.
    kcols: number of columns to eliminate (static).
    ib: inner blocking (SURVEY.md §7.2 item 1): each ib-column block is
      eliminated with VPU rank-1 updates confined to the block, then the rest
      of the tile gets ONE MXU block-reflector apply and the off-diagonal T
      is composed per block (T12 = -T1 (V1ᵀV2) T2, LAPACK xLARFT block
      composition) — this moves ~(nb-ib)/nb of the panel flops from VPU
      traversals onto the MXU.
    lane_extent: optional static callback ``e -> W`` giving the active lane
      window (number of leading rows of A that can be non-zero once the block
      ending at column ``e`` is reached; must be 128-aligned or m). All VPU
      and MXU traffic for a block is confined to lanes [0, W) — the
      structure-exploitation hook for TTQRT (kernels/ttqrt.py), where the
      stacked couple's triangular zero pattern bounds reflector support.
      Exact: excluded lanes hold exact zeros, and fp sums over exact zeros
      are identities, so the result is bitwise-identical to the full-width
      traversal. Default: full width.
    """
    n, m = at_ref.shape
    dt = at_ref.dtype
    one = jnp.ones((), dt)
    zero = jnp.zeros((), dt)

    def contract_lanes(a, b):
        out = jax.lax.dot_general(
            a, b, dimension_numbers=(((1,), (1,)), ((), ())),
            precision=precision, preferred_element_type=acc_type(dt),
        )
        return out.astype(dt)

    lane_t = jax.lax.broadcasted_iota(jnp.int32, (1, n), 1)

    for s in range(0, kcols, ib):
        ibk = min(ib, kcols - s)  # static per block
        w_ext = m if lane_extent is None else min(m, lane_extent(s + ibk))
        if w_ext != m and (w_ext % 128 or w_ext <= 0):
            w_ext = m
        lane_r = jax.lax.broadcasted_iota(jnp.int32, (1, w_ext), 1)  # row ids

        def recon_vt(rows_slice, row0: int, nrows: int):
            """Reconstruct Vᵀ rows [row0, row0+nrows) from packed at rows."""
            gid = row0 + jax.lax.broadcasted_iota(jnp.int32, (nrows, 1), 0)
            return jnp.where(
                lane_r == gid, one, jnp.where(lane_r > gid, rows_slice, zero)
            )

        sub_b = jax.lax.broadcasted_iota(jnp.int32, (ibk, 1), 0)
        gid_b = s + sub_b

        def col_step(jj, _, s=s, ibk=ibk, sub_b=sub_b, w_ext=w_ext, lane_r=lane_r):
            j = s + jj
            xrow = at_ref[pl.ds(j, 1), :w_ext]  # (1, W): column j of A
            # keep the Householder scalars as (1, 1) vregs — a scalar-register
            # round trip per value would serialize the (already latency-bound)
            # column loop on vector→SREG transfers
            alpha = jnp.sum(jnp.where(lane_r == j, xrow, zero), axis=1, keepdims=True)
            tailsq = jnp.sum(
                jnp.where(lane_r > j, xrow * xrow, zero), axis=1, keepdims=True
            )
            sgn = jnp.where(alpha >= 0, one, -one)
            nrm = jnp.sqrt(alpha * alpha + tailsq)
            has_tail = tailsq > 0
            beta = jnp.where(has_tail, -sgn * nrm, alpha)
            tau = jnp.where(has_tail, (beta - alpha) / beta, zero)
            scale = jnp.where(has_tail, 1 / (alpha - beta), zero)
            v = jnp.where(lane_r == j, one, jnp.where(lane_r > j, xrow * scale, zero))

            # one merged store: rows > jj get the rank-1 trailing update, row
            # jj gets the packed column (R above the diagonal, beta on it, v
            # below), rows < jj are final (rewritten unchanged) — a single
            # store keeps the serial critical path (load → reduce → sqrt/div →
            # w-reduce → store) as short as possible; T is built AFTER the
            # loop from the gram matrix, off this path entirely.
            blk = at_ref[s : s + ibk, :w_ext]
            w = jnp.sum(blk * v, axis=1, keepdims=True)  # (ibk, 1)
            packed_j = jnp.where(
                lane_r == j, beta, jnp.where(lane_r > j, xrow * scale, xrow)
            )
            at_ref[s : s + ibk, :w_ext] = jnp.where(
                sub_b == jj,
                packed_j,
                blk - jnp.where(sub_b > jj, tau * w, zero) * v,
            )
            # stash tau on T's diagonal (no in-loop dependencies; consumed by
            # the post-loop T build)
            tt_ref[pl.ds(j, 1), :] = jnp.where(lane_t == j, tau, zero)
            return 0

        jax.lax.fori_loop(0, ibk, col_step, 0, unroll=False)

        vt_b = recon_vt(at_ref[s : s + ibk, :w_ext], s, ibk)  # (ibk, W) = V_bᵀ

        # post-loop block T build (LAPACK xLARFT, but latency-free): with
        # G = V_bᵀV_b (one MXU gram) and T₀ = diag(τ), the doubling recurrence
        #   T ← T − T (G ⊙ M_b) T,  M_b = cross-block mask at pair width b,
        # composes T for widths 1,2,4,… (T12 = −T1 (V1ᵀV2) T2 for every
        # adjacent pair at once) in ⌈log2 ibk⌉ tiny matmuls — no serial
        # column recurrence. Computed transposed (ttb = T_bᵀ, lower-tri).
        g = contract_lanes(vt_b, vt_b)  # (ibk, ibk) gram, symmetric
        taus = jnp.sum(
            jnp.where(
                gid_b == jax.lax.broadcasted_iota(jnp.int32, (ibk, ibk), 1) + s,
                tt_ref[s : s + ibk, s : s + ibk],
                zero,
            ),
            axis=1,
            keepdims=True,
        )  # (ibk, 1) = τ per block column
        rows_b = jax.lax.broadcasted_iota(jnp.int32, (ibk, ibk), 0)
        cols_b = jax.lax.broadcasted_iota(jnp.int32, (ibk, ibk), 1)
        ttb = jnp.where(rows_b == cols_b, taus, zero)
        bsz = 1
        while bsz < ibk:
            # transposed recurrence: Tᵀ ← Tᵀ − Tᵀ (G ⊙ Mᵀ) Tᵀ with the mask
            # selecting (row block = col block + 1, col block even)
            mask = ((cols_b // bsz) % 2 == 0) & (rows_b // bsz == cols_b // bsz + 1)
            gm = jnp.where(mask, g, zero)
            ttb = ttb - jnp.dot(
                ttb,
                jnp.dot(gm, ttb, precision=precision, preferred_element_type=acc_type(dt)).astype(dt),
                precision=precision,
                preferred_element_type=acc_type(dt),
            ).astype(dt)
            bsz *= 2
        tt_ref[s : s + ibk, s : s + ibk] = ttb
        tt_bb = ttb  # (ibk, ibk) = T_bᵀ

        # MXU block apply to all remaining columns: A_rest ← A_rest − V_b T_bᵀ V_bᵀ A_rest
        if s + ibk < n:
            at_rest = at_ref[s + ibk :, :w_ext]  # (n_rest, W) = A[:, rest]ᵀ
            w1 = contract_lanes(at_rest, vt_b)  # (n_rest, ibk) = (V_bᵀ A_rest)ᵀ
            w2 = contract_lanes(w1, tt_bb)  # = (T_bᵀ V_bᵀ A_rest)ᵀ
            at_ref[s + ibk :, :w_ext] = at_rest - jnp.dot(
                w2, vt_b, precision=precision, preferred_element_type=acc_type(dt)
            ).astype(dt)

        # off-diagonal T: T[0:s, s:s+ibk] = −T1 (V1ᵀ V_b) T_b, stored transposed
        if s > 0:
            vt_prev = recon_vt(at_ref[0:s, :w_ext], 0, s)
            zt = contract_lanes(vt_b, vt_prev)  # (ibk, s) = V_bᵀ V1
            m2 = jnp.dot(
                zt, tt_ref[0:s, 0:s], precision=precision,
                preferred_element_type=acc_type(dt),
            ).astype(dt)
            tt_ref[s : s + ibk, 0:s] = -jnp.dot(
                tt_bb, m2, precision=precision, preferred_element_type=acc_type(dt)
            ).astype(dt)


def _geqrt_kernel(a_ref, packed_ref, t_ref, at_scr, tt_scr):
    m, n = a_ref.shape
    at_scr[:] = a_ref[:].T
    tt_scr[:] = jnp.zeros_like(tt_scr)
    geqrt_in_refs(at_scr, tt_scr, min(m, n))
    packed_ref[:] = at_scr[:].T
    t_ref[:] = tt_scr[:].T


@functools.partial(jax.jit, static_argnames=("interpret",))
def _geqrt_call(a, interpret: bool):
    m, n = a.shape
    return pl.pallas_call(
        _geqrt_kernel,
        out_shape=(
            jax.ShapeDtypeStruct((m, n), a.dtype),
            jax.ShapeDtypeStruct((n, n), a.dtype),
        ),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((n, m), a.dtype),
            pltpu.VMEM((n, n), a.dtype),
        ],
        interpret=interpret,
    )(a)


def geqrt(a: jnp.ndarray, interpret: bool | None = None):
    """Standalone single-tile GEQRT: a (m, n) → (packed, T). Unit-test entry;
    the drivers use the fused panel kernel (kernels/panel.py) instead."""
    return _geqrt_call(a, resolve_interpret(interpret))
