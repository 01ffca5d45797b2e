"""QR configuration (SURVEY.md §5 "Config/flag system").

The reference exposes matrix size / tile size through argv [SURVEY.md §5,
INFERRED]; here the equivalent is a small frozen dataclass threaded through
the drivers. Hashable so it can be a static argument under ``jax.jit``.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class QRConfig:
    """Configuration for tiled QR runs.

    Attributes:
      nb: tile size (square nb×nb tiles). Must be a multiple of 128 on TPU
        so tiles map exactly onto MXU/VPU native shapes; 256 is the
        acceptance-config value (BASELINE.json:8).
      ib: inner blocking inside the panel kernels: ``ib`` Householder columns
        are produced with VPU rank-1 updates, then the rest of the tile is
        updated with one MXU block-apply. Auto-clamped to the largest
        divisor of nb not exceeding it. Default 128: with the post-loop T build the per-block
        boundary costs (MXU apply + T compose dispatches) dominate over the
        in-loop rank-1 width, so fewer/wider blocks win (measured 7.79 ms vs
        9.46 ms at 4096², ib=128 vs 64).
      dtype: compute dtype (fp32 is the acceptance dtype).
      precision: matmul precision used *inside* kernels. "highest" (the
        MXU's fp32 mode, ~1/6 of bf16 peak) keeps fp32-accurate trailing
        updates — the acceptance default (full-width relerr ~3e-7 at
        16384²). "b3" is the manual bf16x3 fp32 emulation
        (kernels/common.py: hi/lo split, 3 native bf16 MXU passes — Mosaic
        does not lower Precision.HIGH in-kernel): measured 28.4 TFLOP/s at
        16384² (1.28× over highest) at full-width relerr ~7e-6. "b4" adds
        the lo·lo 4th pass: 26.2 TFLOP/s at ~5.9e-6 — the measured r5
        ladder point proving any 2-way bf16 split is capped by its ~2⁻¹⁷
        representation residual, so neither emulated mode meets the ≤1e-6
        acceptance gate (BASELINE.md r5 precision ladder; the 6-pass
        3-way split that would is exactly what "highest" already lowers
        to, at the hardware fp32 rate). The panel kernels keep their
        internal HIGHEST in every mode. "default" (single bf16 pass,
        relerr ~1e-2) is for experiments only.
      interpret: run Pallas kernels in interpreter mode. ``None`` means
        auto: interpret on non-TPU backends (so the whole test suite runs
        on CPU), compiled Mosaic on TPU.
      chunk: sub-diagonal couple height in tiles for the square driver
        (kernels/chain.py): 1 reproduces the reference's flat-tree tile
        algebra exactly; larger values cut the latency-bound panel
        column-loop count by ~chunk x. The driver reduces it to the largest
        divisor of the row-tile count.
      mesh_shape: (rows, cols) for the sharded driver.
      driver: square-path driver selection. "static" trace-unrolls the
        panel loop — fastest steady-state, but first-compile cost grows
        with the panel count (~45 min at 16384² through this environment's
        remote-compile service). "dynamic" runs an O(1)-kernel
        ``lax.fori_loop`` driver (drivers/square_dyn.py — Mosaic dynamic
        grids + scalar-prefetch index maps): compiles in seconds at any
        size for a ~6–20% steady-state cost (9.31 vs 7.79 ms at 4096²;
        ~296 vs 280 ms at 16384²) — the bounded-compile path for
        32768²-scale panel counts (SURVEY.md §7.2 item 3). "auto"
        (default) picks static for ≤ 32 panels and dynamic beyond, so a
        first call at 16384²+ costs seconds, not an unannounced
        multi-minute compile; pass "static" explicitly to force the
        trace-unrolled driver at any size.
      prescale: divide A by an exact power-of-2 ≥ max|A| before factoring
        and fold the scale back into R. Lifts the documented fp32
        input-magnitude limit (kernels/geqrt.py: column norms overflow for
        entries ≳1e19) at the cost of one extra pass over A. Exact: QR
        commutes with scalar scaling, power-of-2 division is lossless, and
        the Householder reflectors are scale-invariant. Default off to keep
        the hot path traffic-free.

    Elimination-tree selection is implicit per path (matching the reference,
    SURVEY.md §2.3): the square driver uses the flat chain (chunked), the
    tall-skinny path the TSQR binary tree, and the sharded driver a
    hierarchy of local chains + a binary TTQRT tree across mesh rows.
    """

    nb: int = 256
    ib: int = 128
    # Inner blocking for the batched grouped kernel (drivers/batched.py) —
    # a separate knob because its measured optimum (32: 24.9 ms at the
    # config-4 shape) differs from the square path's (128: block boundaries
    # amortize differently over (G, ib, m) stacks; g=16/ib=128 additionally
    # crashes the Mosaic compiler, BASELINE.md r2 batched sweep).
    batched_ib: int = 32
    # Batched-path algorithm: "hh" = grouped Householder GEQRT kernels
    # (unconditionally stable); "cholqr2" = batched CholeskyQR2
    # (drivers/cholqr.py: one grouped Pallas POTRF + matmul-only inverse and
    # orthogonality correction — the MXU-friendly path, but requires
    # cond(A)²·eps < 1, i.e. cond ≲ 1e3 in fp32). See BASELINE.md r3 for
    # the measured comparison at the config-4 shape.
    batched_method: str = "hh"
    # Square-path panel algorithm: "hh" = tiled Householder panels (the
    # unconditionally stable default, drivers/square.py / square_dyn.py);
    # "hr" = CholeskyQR2 panels + Householder reconstruction
    # (drivers/square_hr.py: matmul-only panels, the serial work shrinks to
    # one nb×nb modified-LU kernel per panel — the fast path for
    # well-conditioned matrices, cond(A) ≲ 1e3 in fp32).
    square_method: str = "hh"
    # hr breakdown guard (square_method="hr" only). The hr/CholeskyQR2 panel
    # factorization has a conditioning contract (cond(panel)²·eps ≪ 1); each
    # panel's round-1 orthogonality defect ‖Q₁ᵀQ₁ − I‖_max is a nearly-free
    # breakdown monitor (an observer reduce on an already-computed
    # intermediate — results are bitwise-unchanged). Policy when the max
    # defect exceeds hr_guard_tau (or is NaN):
    #   "fallback": warn and refactor with the unconditionally stable
    #     Householder path (the hr work is discarded — breakdown is the
    #     rare case, paying 2× there beats silently wrong factors);
    #   "warn": warn, keep the hr factors (caller opted into the contract);
    #   "off": no check (no host sync; also the behavior whenever qr_factor
    #     is called inside a jax.jit trace, where a host check is
    #     impossible — HRFactors.health still carries the device scalar).
    hr_guard: str = "fallback"
    # Guard threshold on ‖Q₁ᵀQ₁ − I‖_max. The correction round leaves
    # O(‖E‖⁴) orthogonality error (truncated chol(I+E) iteration + cubic
    # Neumann inverse), so ≤1e-6 backward error needs ‖E‖ ≲ 0.03–0.05;
    # gaussian panels measure ‖E‖ ~ 1e-4 and true breakdowns blow past 1
    # (or NaN), so the gate sits in a wide, empirically-calibrated gap
    # (tests/test_square_hr.py guard tests).
    hr_guard_tau: float = 0.05
    chunk: int = 4
    dtype: jnp.dtype = jnp.float32
    precision: str = "highest"
    interpret: Optional[bool] = None
    mesh_shape: Tuple[int, int] = (4, 2)
    driver: str = "auto"
    prescale: bool = False
    # Donate the (padded) input buffer to the dynamic-driver factorization:
    # required at 32768² fp32 on one chip (factors + carry ~11.5 GiB; the
    # 4 GiB input must be released). Invalidates the caller's array when
    # padding was a no-op; off by default.
    donate: bool = False

    # static-driver panel-count ceiling for driver="auto" (32 panels ≈
    # 8192² at nb=256 — compile stays in low minutes and is cached)
    AUTO_STATIC_MAX_PANELS = 32

    def __post_init__(self):
        if self.nb % 8 != 0:
            raise ValueError(f"nb={self.nb} must be a multiple of 8")
        if self.ib < 1:
            raise ValueError(f"ib={self.ib} must be >= 1")
        if self.ib > self.nb:
            object.__setattr__(self, "ib", self.nb)
        if self.nb % self.ib != 0:
            # ib is a pure performance knob: clamp to the largest divisor of
            # nb not exceeding it (the ib=128 default must not invalidate
            # nb values like 160/192/320 that were legal under ib=32)
            ib = self.ib
            while self.nb % ib:
                ib -= 1
            object.__setattr__(self, "ib", ib)
        if self.driver not in ("auto", "static", "dynamic"):
            raise ValueError(f"driver={self.driver!r} must be auto|static|dynamic")
        if self.square_method not in ("hh", "hr"):
            raise ValueError(
                f"square_method={self.square_method!r} must be hh|hr"
            )
        if self.hr_guard not in ("fallback", "warn", "off"):
            raise ValueError(
                f"hr_guard={self.hr_guard!r} must be fallback|warn|off"
            )

    def resolve_driver(self, m: int, n: int) -> str:
        """Concrete driver for an (m, n) problem ("auto" → panel-count rule)."""
        if self.driver != "auto":
            return self.driver
        from tileqr.core.layout import round_up

        k_max = min(round_up(m, self.nb), round_up(n, self.nb)) // self.nb
        return "static" if k_max <= self.AUTO_STATIC_MAX_PANELS else "dynamic"

    def replace(self, **kw) -> "QRConfig":
        return dataclasses.replace(self, **kw)


DEFAULT = QRConfig()
