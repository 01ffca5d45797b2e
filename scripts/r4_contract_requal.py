"""Round-4: re-qualify the 32768² contract size (BASELINE.json:11) with the
post-accumulation-fix code and FULL-WIDTH residuals (VERDICT r3 missing-#1).

Every r3 32768² accuracy number predates the pairwise/Kahan/split-K fixes
AND was a 512-column-slice check, which the r3 record itself proved
misleads (~7× understated for b3). This run measures, on the real chip:

  1. chunked-hr "highest"  — qr_hr_chunked (XLA path; _apply_block_t
     inherits split-K wide W + pairwise grams)
  2. chunked-hr "b3"       — the in-kernel bf16x3 Pallas panel-apply path
     (use_kernel=True default for b3; Kahan-compensated W)
  3. dyn-HH                — the unconditionally stable bounded-compile
     Householder driver

each with wall-clock (direct timing: device work is seconds, the ~30 ms
tunnel sync floor is <2%) and the full-width ‖QᵀA − R‖F/‖A‖F via
utils.verify.relerr_streamed (measurement apply at HIGHEST with the
pairwise/split-K W — the factor's quality, not the apply emulation's).

Memory choreography: A is NEVER held across a factorization (the chunked
driver's live set is already carry + window + factors ≈ 10-12 GiB on the
16 GiB chip) — every path regenerates A on device per run and the residual
pass regenerates A's column blocks from their per-block PRNG keys
(relerr_streamed's callable-a mode).

Usage: python scripts/r4_contract_requal.py [path ...]  (default: all 3)
"""
import sys
import time

sys.path.insert(0, "/root/repo")
import numpy as np  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from tileqr.drivers.square_hr import (  # noqa: E402
    apply_q_hr_chunked,
    qr_hr_chunked,
)
from tileqr.utils.verify import relerr_streamed  # noqa: E402

import os  # noqa: E402

N = int(os.environ.get("TILEQR_REQUAL_N", "32768"))
NB = int(os.environ.get("TILEQR_REQUAL_NB", "256"))
# barrier spacing for the hr chunked runs: 1 keeps ONE live 4 GiB trailing
# temp instead of two (the r3 seg/be sweep measured the defaults flat, so
# a be=1 warm timing is representative) — the warm-run OOM margin at the
# contract size is exactly one such temp
BE = int(os.environ.get("TILEQR_REQUAL_BE", "2"))
FLOPS = 2.0 * N * N * (N - N / 3.0)


INTERP = jax.default_backend() != "tpu"  # CPU smoke runs use interpret mode


def sync(x):
    _ = np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[0])


def free(*trees):
    """Explicitly delete device buffers NOW — python rebinding alone leaves
    multi-GiB frees to GC timing + the async tunnel, which is exactly what
    OOMed the warm runs (the chunked driver's live set is 10-12 GiB and the
    cold run's factors must be GONE before the next gen_a burst)."""
    import gc

    for tr in trees:
        for leaf in jax.tree_util.tree_leaves(tr):
            if hasattr(leaf, "delete"):
                try:
                    leaf.delete()
                except Exception:
                    pass
    gc.collect()


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def mem(tag):
    try:
        st = jax.local_devices()[0].memory_stats()
        log(
            f"mem[{tag}]: in_use {st.get('bytes_in_use', -1)/2**30:.2f} GiB"
            f" peak {st.get('peak_bytes_in_use', -1)/2**30:.2f}"
            f" limit {st.get('bytes_limit', -1)/2**30:.2f}"
        )
    except Exception as exc:
        log(f"mem[{tag}]: unavailable ({exc})")


# A is built from per-column-block PRNG keys so the residual pass can
# regenerate any block EXACTLY without holding the 4 GiB input (the dyn-HH
# factors + R already fill HBM; see relerr_streamed's callable-a mode)
CB = min(4096, N // 2)


def gen_blk(j0, j1):
    assert j0 % CB == 0 and (j1 - j0) == CB
    return jax.jit(
        lambda: jax.random.normal(
            jax.random.fold_in(jax.random.PRNGKey(0), j0 // CB),
            (N, CB), jnp.float32,
        )
    )()


def _put_blk(a, blk, j0):
    return jax.lax.dynamic_update_slice(a, blk, (0, j0))


_put_blk = jax.jit(_put_blk, donate_argnums=(0,))


def gen_a(buf=None):
    """Assemble A block-by-block with donated update-slices: peak device
    memory A + one block ≈ 4.6 GiB (a single jitted concatenate holds all
    block temps alongside the output — 8 GiB transient, which OOMed the
    second run while the first run's frees were still draining through the
    async tunnel).

    buf: an existing (N, N) fp32 device array to DONATE as the target —
    the 8 column blocks tile the full matrix, so every stale element is
    overwritten and NO new 4 GiB allocation happens (the warm-run trick:
    recycle R's buffer instead of fighting the tunnel's free-drain)."""
    a = buf if buf is not None else jax.jit(
        lambda: jnp.zeros((N, N), jnp.float32)
    )()
    for j in range(N // CB):
        a = _put_blk(a, gen_blk(j * CB, (j + 1) * CB), jnp.int32(j * CB))
    sync(a)
    return a


def retry_oom(fn, waits=(30.0, 90.0)):
    """The async tunnel can hold multi-GiB frees long after the python-side
    delete; on RESOURCE_EXHAUSTED wait out the drain and retry."""
    for w in waits:
        try:
            return fn()
        except Exception as exc:  # jax.errors.JaxRuntimeError
            if "RESOURCE_EXHAUSTED" not in str(exc):
                raise
            mem("oom")
            log(f"warm run OOM — waiting {w:.0f} s for the tunnel drain")
            import gc

            gc.collect()
            time.sleep(w)
    return fn()


def settle():
    """Give the async tunnel time to actually release freed device buffers
    before the next multi-GiB allocation burst."""
    sync(jax.jit(lambda: jnp.ones((8, 8), jnp.float32))())
    time.sleep(10.0)


def hr_path(precision):
    """A is NOT held (first attempt OOMed: the chunked driver's live set is
    carry + window + factors ≈ 10-12 GiB, BASELINE.md r3, and the original
    4 GiB input alongside exceeds the 16 GB HBM). Each run regenerates A on
    device and the factorization donates it as the carry; the residual
    regenerates A's column blocks from their PRNG keys."""
    assert N % NB == 0  # pad_for_hr would allocate a redundant 4 GiB copy

    def run():
        ap = gen_a()
        mem("A generated")
        t0 = time.perf_counter()
        r, panels = qr_hr_chunked(ap, NB, precision=precision,
                                  interpret=INTERP, barrier_every=BE)
        sync(r)
        return time.perf_counter() - t0, r, panels

    t_cold, r, panels = run()
    log(f"hr-{precision}: cold factor {t_cold:.1f} s")
    mem("cold done")
    # residual FIRST, on the cold factors — the accuracy number is the
    # acceptance-critical artifact and must not depend on the warm-timing
    # attempt surviving the tunnel's free-drain behavior
    t0 = time.perf_counter()
    rel = relerr_streamed(
        lambda c: apply_q_hr_chunked(
            panels, jnp.asarray(c), NB, trans=True, precision="highest"
        ),
        gen_blk, r, col_block=CB, n_cols=N,
    )
    log(
        f"hr-{precision}: FULL-WIDTH relerr {rel:.3e} "
        f"(residual pass {time.perf_counter()-t0:.1f} s)"
    )
    # warm timing: recycle R's 4 GiB buffer as the new A (gen_a(buf=r)
    # donates it; the 8 blocks tile the matrix) so the warm run allocates
    # NOTHING new at full size — only the panels' ~2.5 GiB must drain.
    free(panels)
    panels = None
    settle()

    state = {"buf": r}
    r = None

    def warm():
        # R's buffer can be donated only once — retries allocate fresh
        a2 = gen_a(buf=state.pop("buf", None))
        t0 = time.perf_counter()
        r2, p2 = qr_hr_chunked(a2, NB, precision=precision,
                               interpret=INTERP, barrier_every=BE)
        sync(r2)
        return time.perf_counter() - t0, r2, p2

    try:
        t_warm, _, _ = retry_oom(warm)
        log(
            f"hr-{precision}: warm factor {t_warm*1e3:.1f} ms = "
            f"{FLOPS / t_warm / 1e12:.2f} TFLOP/s"
        )
    except Exception as exc:
        # non-fatal: the acceptance-critical residual is already logged
        t_warm = float("nan")
        log(f"hr-{precision}: warm timing unavailable ({type(exc).__name__})")
    return t_warm, rel


def dyn_hh_path():
    """A is NOT held: each run regenerates it on device and donates it to
    the factorization (factors + carry ≈ 11.5 GiB at this size, BASELINE.md
    r2); the residual regenerates A's column blocks from their keys."""
    from tileqr.drivers.square import assemble_r
    from tileqr.drivers.square_dyn import apply_q_tiled_dyn, qr_tiled_dyn

    def run():
        ap = gen_a()
        t0 = time.perf_counter()
        a_out, df = qr_tiled_dyn(ap, NB, ib=128, chunk=4, precision="highest",
                                 interpret=INTERP, donate=True)
        sync(a_out)
        return time.perf_counter() - t0, a_out, df

    t_cold, a_out, df = run()
    log(f"dyn-hh: cold factor {t_cold:.1f} s")
    mem("cold done")
    # residual FIRST on the cold factors (see hr_path). assemble_r run
    # EAGERLY holds triu/update/reshape temps (3-4 extra 4 GiB buffers)
    # alongside a_out + df and OOMs; under a donated jit XLA reuses
    # a_out's buffer (df carries its own copies of the reflector tiles,
    # so a_out is dead after this).
    asm = jax.jit(assemble_r, static_argnames=("nb",), donate_argnums=(0,))
    r = asm(a_out, df.r_diag, nb=NB)
    sync(r)
    a_out = None
    settle()
    t0 = time.perf_counter()
    rel = relerr_streamed(
        lambda c: apply_q_tiled_dyn(df, jnp.asarray(c), trans=True,
                                    precision="highest", interpret=INTERP),
        gen_blk, r, col_block=CB, n_cols=N,
    )
    log(
        f"dyn-hh: FULL-WIDTH relerr {rel:.3e} "
        f"(residual pass {time.perf_counter()-t0:.1f} s)"
    )
    free(df)
    df = None
    settle()
    mem("after free+settle")
    state = {"buf": r}
    r = None

    def warm():
        ap = gen_a(buf=state.pop("buf", None))
        t0 = time.perf_counter()
        a2, d2 = qr_tiled_dyn(ap, NB, ib=128, chunk=4, precision="highest",
                              interpret=INTERP, donate=True)
        sync(a2)
        return time.perf_counter() - t0, a2, d2

    try:
        t_warm, _, _ = retry_oom(warm)
        log(
            f"dyn-hh: warm factor {t_warm*1e3:.1f} ms = "
            f"{FLOPS / t_warm / 1e12:.2f} TFLOP/s"
        )
    except Exception as exc:
        t_warm = float("nan")
        log(f"dyn-hh: warm timing unavailable ({type(exc).__name__})")
    return t_warm, rel


def main(paths):
    if len(paths) > 1:
        # one subprocess per path: process exit is the only guaranteed full
        # HBM release (the 10-12 GiB live sets of consecutive paths
        # otherwise race the tunnel drain); the persistent compile cache is
        # shared
        import subprocess

        for p in paths:
            rc = subprocess.call(
                [sys.executable, os.path.abspath(__file__), p]
            )
            if rc != 0:
                log(f"path {p} failed rc={rc}")
        return
    log(f"device: {jax.devices()}")
    if "hr" in paths:
        hr_path("highest")
    if "b3" in paths:
        hr_path("b3")
    if "dyn" in paths:
        dyn_hh_path()


if __name__ == "__main__":
    main(sys.argv[1:] or ["hr", "b3", "dyn"])
