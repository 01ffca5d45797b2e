"""Round-3: bounded-compile chunked hr driver on the chip.

(a) 32768² — the contract-scale matrix the trace-unrolled qr_hr cannot
    compile (remote compile helper SIGKILL at 128 panels); the segmented
    driver compiles O(16) small programs. Target: beat the dynamic HH
    driver's 2009.8 ms / 23.34 TFLOP/s single-chip record.
(b) 16384² chunked-vs-static overhead (jit-boundary cost at 64 panels).
(c) precision="b3" (barrier-protected XLA split, kernels/common.py):
    2× MXU throughput on the trailing updates at b3-class (~1e-5) error.

Timing: single-dispatch best-of-3 (the ~31 ms tunnel sync floor is <2% at
these runtimes); input generated on device; the chunked driver donates its
padded input, so inputs are regenerated per run. Residual: apply_q_hr on a
512-column slice, float64 on host.
"""
import sys, time

sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from tileqr.drivers.square_hr import apply_q_hr, qr_hr_chunked  # noqa: E402


def sync(r):
    _ = np.asarray(jax.tree_util.tree_leaves(r)[0].ravel()[0])


def gen(n, seed=0):
    a = jax.jit(
        lambda: jax.random.normal(jax.random.PRNGKey(seed), (n, n), jnp.float32)
    )()
    sync(a)
    return a


def qr_flops(n):
    return 2.0 * n * n * (n - n / 3.0)


def bench(n, nb=256, precision="highest", seg=8, be=2, check=True, reps=3):
    t0 = time.perf_counter()
    r, panels = qr_hr_chunked(
        gen(n), nb, precision=precision, seg_panels=seg, barrier_every=be
    )
    sync(r)
    t_first = time.perf_counter() - t0

    times = []
    for _ in range(reps):
        # free the previous run's factors BEFORE allocating the next input
        # (r + panels ≈ 6 GiB at 32768²; holding them across gen() OOMs)
        del r, panels
        a = gen(n)
        t0 = time.perf_counter()
        r, panels = qr_hr_chunked(
            a, nb, precision=precision, seg_panels=seg, barrier_every=be
        )
        sync(r)
        times.append(time.perf_counter() - t0)
    t = min(times)
    line = (
        f"hr-chunked {n}^2 nb={nb} {precision} seg={seg} be={be}: "
        f"{t*1e3:.1f} ms  {qr_flops(n)/t/1e12:.2f} TFLOP/s  "
        f"(compile+first {t_first:.0f} s)"
    )
    if check:
        del r, panels
        a = gen(n)
        a_cols = np.asarray(jax.lax.slice(a, (0, 0), (n, 512)), np.float64)
        r, panels = qr_hr_chunked(
            a, nb, precision=precision, seg_panels=seg, barrier_every=be
        )
        qr_cols = apply_q_hr(
            panels, jax.lax.slice(r, (0, 0), (n, 512)), nb, trans=False,
            precision="highest",
        )
        rel = np.linalg.norm(np.asarray(qr_cols, np.float64) - a_cols) / np.linalg.norm(a_cols)
        line += f"  relerr(512-col) {rel:.2e}"
    print(line, flush=True)


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "32k"
    if which == "32k":
        bench(32768, precision="highest", reps=2, be=2)
    elif which == "32k_b3":
        bench(32768, precision="b3", reps=2, be=8)
    elif which == "16k":
        bench(16384, precision="highest", be=int(sys.argv[2]) if len(sys.argv) > 2 else 2)
    elif which == "16k_b3":
        bench(16384, precision="b3", be=int(sys.argv[2]) if len(sys.argv) > 2 else 2)
    elif which == "8k_b3":
        bench(8192, precision="b3", be=8)
