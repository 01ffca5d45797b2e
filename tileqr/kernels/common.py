"""Shared kernel utilities: precision/interpret resolution, masks, matmul."""

from __future__ import annotations


import jax
import jax.numpy as jnp

_PRECISIONS = {
    "highest": jax.lax.Precision.HIGHEST,
    "high": jax.lax.Precision.HIGH,
    "default": jax.lax.Precision.DEFAULT,
}

# Manual bf16x3 fp32-emulated matmul (VERDICT r2 next-#2): Mosaic does not
# lower lax.Precision.HIGH in-kernel, so the hi/lo split is built by hand in
# dot/dot_t below. Resolves to itself (a string sentinel the dot helpers
# recognize); it only changes the UPDATE kernels — the panel kernels
# (geqrt.py) pin their own internal precision to HIGHEST.
B3 = "b3"
# bf16x4: the same 2-way split with the lo·lo term kept — the exact product
# of the 16-bit split representations. One more native bf16 MXU pass than
# b3 (4/3 of its flops) removes the DROPPED-TERM error, but the split's own
# representation residual (~2⁻¹⁷ relative per operand) remains, so the
# accuracy class only moves ~2× (measured: full-width QR relerr 3.05e-06 vs
# b3's 7.08e-06 at 16384², BASELINE.md r5 precision ladder). Any 2-way
# split is capped there; fp32-class needs the 3-way split's 6 passes =
# exactly what Precision.HIGHEST already lowers to on the MXU — so the
# ladder has no ≤1e-6 point cheaper than HIGHEST.
B4 = "b4"
# dropped-pass count per emulated mode (2-way hi/lo split passes kept)
_EMULATED = {B3: 3, B4: 4}


def resolve_precision(name: str):
    if name in _EMULATED:
        return name
    return _PRECISIONS[name]


def _split_bf16(a):
    """a ≈ hi + lo with both bf16: hi holds the top 8 mantissa bits, lo the
    next 8 (the fp32 residual rounded to bf16)."""
    hi = a.astype(jnp.bfloat16)
    lo = (a - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def _split_bf16_xla(a):
    """XLA-level protected split via integer mantissa masking. Outside
    Pallas the _split_bf16 form is silently destroyed: this environment's
    compile service runs with --xla_allow_excess_precision=true, under
    which XLA elides the bf16→f32 round-trip inside the split (hi stays
    fp32 ⇒ lo = a − a = 0), degrading the 3-pass emulation to ONE bf16
    pass — measured relerr 2.35e-03 (= DEFAULT) at 3-pass cost. The probe
    ladder (scripts/tpu_r3_b3_barrier.py, BASELINE.md r3): a barrier AFTER
    the split is too late (fold happens inside); an optimization_barrier
    between the converts fixes accuracy (4.4e-06 at 59 TFLOP/s on 4096³)
    but each barrier is a scheduler FENCE — inside the hr drivers the
    fences serialize the panel/update overlap and b3 measured SLOWER than
    HIGHEST (49.6 vs 37.1 ms at 8192²); a bitcast round-trip is folded
    right back (2.35e-03). The winner: hi = fp32 with the low 16 mantissa
    bits MASKED OFF (bitcast → &0xFFFF0000 → bitcast) — no float-convert
    pattern to elide, no fence, and hi→bf16 is an exact bit truncation.
    Truncation doubles the split residual vs round-to-nearest (1.3e-05 vs
    4.4e-06 on the 4096³ probe) — same error class, full speed (61
    TFLOP/s). Inside Mosaic kernels the converts are explicit vector ops
    and need no protection (_split_bf16)."""
    hi32 = jax.lax.bitcast_convert_type(
        jax.lax.bitcast_convert_type(a, jnp.int32) & jnp.int32(-65536),
        jnp.float32,
    )
    return hi32.astype(jnp.bfloat16), (a - hi32).astype(jnp.bfloat16)


def dot_b3_xla(a, b, dims, passes: int = 3):
    """XLA-level (non-Pallas) 3/4-pass bf16 fp32 emulation — the barrier-
    protected twin of _dot_bx, for drivers whose update matmuls are plain
    XLA ops (the hr family). passes=4 adds the lo·lo term (B4)."""
    def d(x, y):
        return jax.lax.dot_general(
            x, y, dimension_numbers=dims,
            precision=jax.lax.Precision.DEFAULT,
            preferred_element_type=jnp.float32,
        )

    ah, al = _split_bf16_xla(a)
    bh, bl = _split_bf16_xla(b)
    out = d(ah, bh) + (d(ah, bl) + d(al, bh))
    if passes >= 4:
        out = out + d(al, bl)
    return out


def _dot_bx(a, b, dims, passes: int = 3):
    """3/4-pass bf16 emulation of an fp32 contraction: AB ≈ Ah·Bh + Ah·Bl +
    Al·Bh (+ Al·Bl for passes=4), each a native-speed bf16 MXU pass
    accumulated in fp32. At 3 passes the dropped Al·Bl term is ~2⁻¹⁶
    relative — the same order as the split's own representation error, so
    the result carries ~16 mantissa bits (measured: QR relerr ~1e-5 vs
    HIGHEST's ~3e-7, BASELINE.md r3). The 4th pass removes the dropped
    term but not the representation residual (see B4 note above).
    IN-KERNEL USE ONLY — at the XLA level use dot_b3_xla (excess-precision
    folding, see _split_bf16_xla)."""
    def d(x, y):
        return jax.lax.dot_general(
            x, y, dimension_numbers=dims,
            precision=jax.lax.Precision.DEFAULT,
            preferred_element_type=jnp.float32,
        )

    ah, al = _split_bf16(a)
    bh, bl = _split_bf16(b)
    out = d(ah, bh) + (d(ah, bl) + d(al, bh))
    if passes >= 4:
        out = out + d(al, bl)
    return out


def _dot_b3(a, b, dims):
    """Back-compat alias (r3 measurement scripts): 3-pass in-kernel form."""
    return _dot_bx(a, b, dims, 3)


def resolve_interpret(interpret) -> bool:
    """None → auto: interpret Pallas kernels on non-TPU backends so the whole
    suite runs on CPU (SURVEY.md §4 'fake backend' row; §5 race-detection row:
    interpret mode is the Mosaic sanitizer path)."""
    if interpret is None:
        return jax.default_backend() != "tpu"
    return bool(interpret)


def acc_type(dt):
    """Accumulation dtype for matmuls (pallas_guide: always set
    preferred_element_type): fp32 for fp32/bf16 operands; float64 operands
    (CPU/interpret-mode paths — TPUs have no native f64) must accumulate in
    f64 or the whole factorization silently rounds to fp32 accuracy."""
    return dt if dt == jnp.float64 else jnp.float32


def dot(a, b, precision):
    """MXU matmul with dtype-matched accumulation."""
    if precision in _EMULATED and a.dtype == jnp.float32:
        return _dot_bx(
            a, b, (((1,), (0,)), ((), ())), _EMULATED[precision]
        ).astype(a.dtype)
    if precision in _EMULATED:
        precision = jax.lax.Precision.HIGHEST
    return jnp.dot(
        a, b, precision=precision, preferred_element_type=acc_type(a.dtype)
    ).astype(a.dtype)


def dot_t(a, b, precision):
    """aᵀ @ b without materializing the transpose (MXU-native contraction)."""
    if precision in _EMULATED and a.dtype == jnp.float32:
        return _dot_bx(
            a, b, (((0,), (0,)), ((), ())), _EMULATED[precision]
        ).astype(a.dtype)
    if precision in _EMULATED:
        precision = jax.lax.Precision.HIGHEST
    out = jax.lax.dot_general(
        a,
        b,
        dimension_numbers=(((0,), (0,)), ((), ())),
        precision=precision,
        preferred_element_type=acc_type(a.dtype),
    )
    return out.astype(a.dtype)


def tril_mask(m: int, n: int, k: int = 0):
    """Boolean lower-triangle mask via broadcasted_iota (TPU needs ≥2D iota)."""
    rows = jax.lax.broadcasted_iota(jnp.int32, (m, n), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (m, n), 1)
    return rows >= cols - k


def unit_lower(packed: jnp.ndarray) -> jnp.ndarray:
    """V = strictly-lower(packed) + I — the implicit-unit-diagonal convention
    of LAPACK GEQRT packed output (ref/tile_ops.py)."""
    m, n = packed.shape
    rows = jax.lax.broadcasted_iota(jnp.int32, (m, n), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (m, n), 1)
    v = jnp.where(rows > cols, packed, jnp.zeros_like(packed))
    return v + jnp.where(rows == cols, jnp.ones_like(packed), jnp.zeros_like(packed))


def triu(a: jnp.ndarray) -> jnp.ndarray:
    m, n = a.shape
    rows = jax.lax.broadcasted_iota(jnp.int32, (m, n), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (m, n), 1)
    return jnp.where(rows <= cols, a, jnp.zeros_like(a))
