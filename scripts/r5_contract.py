"""Round-5: contract-size (32768², BASELINE.json:11) campaign.

1. chunked-hr "highest" with the r5 IN-KERNEL whole-panel apply (VERDICT r4
   missing-#1): the aliased in-place Pallas apply carries no barrier temps —
   the exact memory shape whose absence OOMed the r4 warm runs — so this
   measures the warm hr-highest wall the r4 record documented unavailable,
   plus the full-width streamed residual on the same factors.
2. Streamed ORTHOGONALITY (VERDICT r4 missing-#3) for both acceptance
   paths: ‖QᵀQ − I‖F estimated through gaussian probe blocks
   (utils.verify.orth_streamed) — the first measured orthogonality number
   at the contract size (previously asserted by reflector algebra for hh
   and by CholeskyQR2 algebra for hr, never measured).
3. dyn-HH re-run for its orth column (its relerr/warm rows are the r4
   record; re-logged here for one-table provenance).

Memory choreography inherited from scripts/r4_contract_requal.py: A is
never held across a factorization (regenerated on device from per-block
PRNG keys and donated as the carry), residual/orth run on the COLD factors
first, warm timing recycles R's buffer via donation, one subprocess per
path.

Usage: python scripts/r5_contract.py [hr|dyn ...]   (default: both)
"""
import os
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
from tileqr.utils.verify import orth_streamed, relerr_streamed  # noqa: E402

N = int(os.environ.get("TILEQR_REQUAL_N", "32768"))
NB = int(os.environ.get("TILEQR_REQUAL_NB", "256"))
BE = int(os.environ.get("TILEQR_REQUAL_BE", "2"))
FLOPS = 2.0 * N * N * (N - N / 3.0)
INTERP = jax.default_backend() != "tpu"


def sync(x):
    _ = np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[0])


def free(*trees):
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
        st = jax.local_devices()[0].memory_stats() or {}
        log(
            f"mem[{tag}]: in_use {st.get('bytes_in_use', -1)/2**30:.2f} GiB"
            f" peak {st.get('peak_bytes_in_use', -1)/2**30:.2f}"
        )
    except Exception as exc:
        log(f"mem[{tag}]: unavailable ({exc})")


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
    a = buf if buf is not None else jax.jit(
        lambda: jnp.zeros((N, N), jnp.float32)
    )()
    for j in range(N // CB):
        a = _put_blk(a, gen_blk(j * CB, (j + 1) * CB), jnp.int32(j * CB))
    sync(a)
    return a


def retry_oom(fn, waits=(30.0, 90.0)):
    for w in waits:
        try:
            return fn()
        except Exception as exc:
            if "RESOURCE_EXHAUSTED" not in str(exc):
                raise
            mem("oom")
            log(f"OOM — waiting {w:.0f} s for the tunnel drain")
            import gc

            gc.collect()
            time.sleep(w)
    return fn()


def settle():
    sync(jax.jit(lambda: jnp.ones((8, 8), jnp.float32))())
    time.sleep(10.0)


def hr_path(precision="highest"):
    assert N % NB == 0

    def run():
        ap = gen_a()
        t0 = time.perf_counter()
        r, panels = qr_hr_chunked(ap, NB, precision=precision,
                                  interpret=INTERP, barrier_every=BE)
        sync(r)
        return time.perf_counter() - t0, r, panels

    t_cold, r, panels = run()
    log(f"hr-{precision} (kernel apply): cold factor {t_cold:.1f} s")
    mem("cold done")
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
    t0 = time.perf_counter()
    orth = orth_streamed(
        lambda c: apply_q_hr_chunked(panels, c, NB, trans=False,
                                     precision="highest"),
        lambda c: apply_q_hr_chunked(panels, c, NB, trans=True,
                                     precision="highest"),
        N, probes=1024, block=512,
    )
    log(
        f"hr-{precision}: streamed orth |QtQ-I|_F {orth:.3e} "
        f"(orth pass {time.perf_counter()-t0:.1f} s)"
    )
    free(panels)
    panels = None
    settle()
    state = {"buf": r}
    r = None

    def warm():
        a2 = gen_a(buf=state.pop("buf", None))
        t0 = time.perf_counter()
        r2, p2 = qr_hr_chunked(a2, NB, precision=precision,
                               interpret=INTERP, barrier_every=BE)
        sync(r2)
        return time.perf_counter() - t0, r2, p2

    try:
        t_warm, r2, p2 = retry_oom(warm)
        log(
            f"hr-{precision}: warm factor {t_warm*1e3:.1f} ms = "
            f"{FLOPS / t_warm / 1e12:.2f} TFLOP/s"
        )
        # second warm sample (best-of-2): recycle again
        free(p2)
        settle()
        state["buf"] = r2
        t_warm2, _, _ = retry_oom(warm)
        log(
            f"hr-{precision}: warm factor #2 {t_warm2*1e3:.1f} ms = "
            f"{FLOPS / t_warm2 / 1e12:.2f} TFLOP/s"
        )
    except Exception as exc:
        log(f"hr-{precision}: warm timing unavailable ({type(exc).__name__})")
    return rel


def dyn_hh_path():
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
    # orth: probes must be padded to the apply's tile width internally —
    # apply_q_tiled_dyn takes (Mp, P) with P padded by the caller in api;
    # here P=512 is already an nb multiple
    t0 = time.perf_counter()
    orth = orth_streamed(
        lambda c: apply_q_tiled_dyn(df, c, trans=False, precision="highest",
                                    interpret=INTERP),
        lambda c: apply_q_tiled_dyn(df, c, trans=True, precision="highest",
                                    interpret=INTERP),
        N, probes=1024, block=512,
    )
    log(
        f"dyn-hh: streamed orth |QtQ-I|_F {orth:.3e} "
        f"(orth pass {time.perf_counter()-t0:.1f} s)"
    )
    return rel


def main(paths):
    if len(paths) > 1:
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
    if "dyn" in paths:
        dyn_hh_path()


if __name__ == "__main__":
    main(sys.argv[1:] or ["hr", "dyn"])
