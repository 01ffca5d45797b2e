"""Round-3: PRODUCTION accuracy/perf of the hr paths after the pairwise +
Kahan accumulation fix (drivers/cholqr.bdot_pair_rows, kernels/panel_apply
_kahan_add, commit be6d354).

The probe (tpu_r3_hr_acc.py) showed the hr sqrt(m) residual growth lives in
the tall-contraction accumulation: V3 (pairwise grams + pairwise update W)
5.41e-07 at 8192^2 vs base 7.38e-07; V4 (+pairwise measurement apply)
3.35e-07 = the hh driver's class. Production mapping:

  - pairwise grams  -> cholqr2_batched (all hr paths, incl. static XLA)
  - Kahan update W  -> panel_apply kernels => the CHUNKED use_kernel path
    (panel_apply_carry) gets the V2 fix; the static XLA path does NOT
    (its trailing W is one XLA dot; the value-level kernel form pays
    window copies that erase the win -- BASELINE.md r3)
  - measurement apply stays the naive wide XLA apply (what a user's
    residual check sees); a kernel-apply variant shows the V4 floor.

Cases (wall: single-dispatch best-of-3, ~31 ms tunnel sync floor <2%;
relerr: on-device f32 norm of apply_q(R) - A, full width):

  khi  {8k,16k}: qr_hr_chunked use_kernel=True precision=highest
  kb3  {8k,16k}: qr_hr_chunked use_kernel=True precision=b3
  (static-XLA twin numbers come from tpu_r3_hr.py sweep2/big)
"""
import sys, time

sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from tileqr.drivers.square_hr import apply_q_hr_chunked, qr_hr_chunked  # noqa: E402


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


def bench(n, nb=256, precision="highest", seg=8, be=2, reps=3, use_kernel=True):
    t0 = time.perf_counter()
    r, panels = qr_hr_chunked(
        gen(n), nb, precision=precision, seg_panels=seg, barrier_every=be,
        use_kernel=use_kernel,
    )
    sync(r)
    t_first = time.perf_counter() - t0

    times = []
    for _ in range(reps):
        del r, panels  # free factors before the next 1 GiB input
        a = gen(n)
        t0 = time.perf_counter()
        r, panels = qr_hr_chunked(
            a, nb, precision=precision, seg_panels=seg, barrier_every=be,
            use_kernel=use_kernel,
        )
        sync(r)
        times.append(time.perf_counter() - t0)
    t = min(times)

    # residual: full-width Q.R vs a fresh copy of A, f32 norms on device;
    # the apply is the chunked XLA apply at HIGHEST (the user-visible check)
    del r, panels
    a = gen(n)
    a_keep = a + jnp.float32(0)  # chunked donates its input
    r, panels = qr_hr_chunked(
        a, nb, precision=precision, seg_panels=seg, barrier_every=be,
        use_kernel=use_kernel,
    )
    qr_prod = apply_q_hr_chunked(panels, r, nb, trans=False, precision="highest")

    @jax.jit
    def rel(qr_prod, a):
        return jnp.linalg.norm(qr_prod - a) / jnp.linalg.norm(a)

    relerr = float(rel(qr_prod, a_keep))
    print(
        f"hr-chunked-kernel {n}^2 nb={nb} {precision} seg={seg} be={be} "
        f"uk={use_kernel}: {t*1e3:.1f} ms  {qr_flops(n)/t/1e12:.2f} TFLOP/s  "
        f"relerr {relerr:.2e}  (compile+first {t_first:.0f} s)",
        flush=True,
    )


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "8k"
    if which == "8k":
        bench(8192, precision="highest", be=8)
        bench(8192, precision="b3", be=8)
    elif which == "16k":
        bench(16384, precision="highest", be=8)
        bench(16384, precision="b3", be=8)
    elif which == "16k_hi":
        bench(16384, precision="highest", be=8)
    elif which == "16k_b3":
        bench(16384, precision="b3", be=8)
    elif which == "32k_b3":
        bench(32768, precision="b3", be=2, reps=2)
    elif which == "32k_hi":
        bench(32768, precision="highest", be=2, reps=2)
