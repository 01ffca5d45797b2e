"""Round-3 probe: can lax.optimization_barrier protect the manual bf16x3
split at the XLA level (outside Pallas)?

BASELINE.md r3 recorded that the pure-XLA b3 emulation folds: the algebraic
simplifier collapses the 3-dot split back into ONE bf16 pass (relerr 2.4e-3
= DEFAULT, and on hr it measured both slower AND bf16-wrong). If a barrier
around the split operands blocks that rewrite, the hr drivers (whose update
matmuls are XLA-level, not Pallas) get the 1.85x b3 MXU speedup as an
opt-in — no new kernel needed.

Measures, at 4096^3: relerr + TFLOP/s for DEFAULT / HIGHEST / naive-b3 /
barrier-b3.
"""
import sys, time

sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def sync(r):
    _ = np.asarray(jax.tree_util.tree_leaves(r)[0].ravel()[0])


def run_once(f, x, y):
    t0 = time.perf_counter()
    sync(f(x, y))
    return time.perf_counter() - t0


def chained(mk, x, y, k=8, reps=3):
    fk, f1 = mk(k), mk(1)
    sync(fk(x, y))
    sync(f1(x, y))
    tk = min(run_once(fk, x, y) for _ in range(reps))
    t1 = min(run_once(f1, x, y) for _ in range(reps))
    return (tk - t1) / (k - 1)


def split(a, barrier):
    # barrier="post": barrier the (hi, lo) pair after the split — measured
    # INSUFFICIENT: with --xla_allow_excess_precision=true (this env's
    # compile service) XLA elides the bf16→f32 round-trip INSIDE the split,
    # so lo = a − a = 0 before the barrier ever sees it (relerr 2.35e-03 =
    # DEFAULT, at 3-pass speed).
    # barrier="mid": barrier hi between the two converts, so the round-trip
    # cannot be folded and lo carries the true residual.
    # barrier="bitcast": block the excess-precision elision of the bf16→f32
    # round-trip with a bf16→i16→bf16 bitcast pair instead of an
    # optimization_barrier — bitcasts are free on hardware and, unlike the
    # barrier, are NOT scheduling fences (the mid-barrier variant measured
    # accurate but SLOW inside the hr drivers: ~64 fences serialize the
    # panel/update overlap).
    if barrier == "mask":
        # fence-free protection: hi is the TRUNCATED top-16-bit fp32 value,
        # produced by integer mantissa masking — there is no f32→bf16→f32
        # convert round-trip for the excess-precision simplifier to elide,
        # and no optimization_barrier to fence the scheduler. hi converts
        # to bf16 exactly (bit truncation); lo carries the masked-off bits
        # (rounded to bf16). Truncation doubles the split residual vs
        # round-to-nearest (2^-8 vs 2^-9 worst case) — same error class.
        ai = jax.lax.bitcast_convert_type(a, jnp.int32)
        hi32 = jax.lax.bitcast_convert_type(
            ai & jnp.int32(-65536), jnp.float32
        )
        return hi32.astype(jnp.bfloat16), (a - hi32).astype(jnp.bfloat16)
    hi = a.astype(jnp.bfloat16)
    if barrier == "mid":
        hi = jax.lax.optimization_barrier(hi)
    elif barrier == "bitcast":
        hi = jax.lax.bitcast_convert_type(
            jax.lax.bitcast_convert_type(hi, jnp.int16), jnp.bfloat16
        )
    lo = (a - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    if barrier == "post":
        hi, lo = jax.lax.optimization_barrier((hi, lo))
    return hi, lo


def b3(a, b, barrier):
    def d(x, y):
        return jax.lax.dot_general(
            x, y, (((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.DEFAULT,
            preferred_element_type=jnp.float32,
        )

    ah, al = split(a, barrier)
    bh, bl = split(b, barrier)
    return d(ah, bh) + (d(ah, bl) + d(al, bh))


if __name__ == "__main__":
    n = 4096
    key = jax.random.PRNGKey(0)
    a = jax.jit(lambda: jax.random.normal(key, (n, n), jnp.float32))()
    b = jax.jit(lambda: jax.random.normal(jax.random.PRNGKey(1), (n, n), jnp.float32))()
    sync(a); sync(b)

    # float64 reference on host for a 256-column slice
    a_np = np.asarray(a, np.float64)
    b_np = np.asarray(b[:, :256], np.float64)
    ref = a_np @ b_np

    variants = {
        "default": lambda x, y: jnp.dot(x, y, precision=jax.lax.Precision.DEFAULT,
                                        preferred_element_type=jnp.float32),
        "highest": lambda x, y: jnp.dot(x, y, precision=jax.lax.Precision.HIGHEST,
                                        preferred_element_type=jnp.float32),
        "b3_naive": lambda x, y: b3(x, y, "none"),
        "b3_post": lambda x, y: b3(x, y, "post"),
        "b3_mid": lambda x, y: b3(x, y, "mid"),
        "b3_bitcast": lambda x, y: b3(x, y, "bitcast"),
        "b3_mask": lambda x, y: b3(x, y, "mask"),
    }
    for name, f in variants.items():
        jf = jax.jit(f)
        out = np.asarray(jf(a, b[:, :256]), np.float64)
        rel = np.linalg.norm(out - ref) / np.linalg.norm(ref)

        def mk(k, f=f):
            @jax.jit
            def g(x, y):
                for _ in range(k):
                    y = f(x, y) * jnp.float32(1e-2)
                return y
            return g

        t = chained(mk, a, b, 8)
        print(f"{name:11s}: {2*n**3/t/1e12:7.2f} TFLOP/s  relerr {rel:.2e}",
              flush=True)
