"""Round-5: contract-size (32768²) chunked-hr-highest TUNING sweep.

The r5 campaign row (scripts/r5_contract.py: 1739.8 ms = 26.96 TFLOP/s)
ran barrier_every=2 — a holdover from the r4 XLA-apply era, where barriers
existed to bound the scheduler's live barrier-temp set. The r5 in-kernel
aliased apply carries NO temps, so the barrier spacing is a free axis
again; nb is the other untuned axis at this size (nb=512 halves the panel
count and doubles the apply matmul width). Timing-only: cold (compile) +
two warm runs per config, one subprocess per config (driver shell loop).
Numerics are unaffected by barrier_every (it only pins copy-out order);
an nb change DOES change the factorization — any shipped nb change must
re-run the full scripts/r5_contract.py qualification.

Usage: python scripts/r5_be_sweep.py   (config from TILEQR_REQUAL_NB/BE)
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

from tileqr.drivers.square_hr import qr_hr_chunked  # noqa: E402

N = int(os.environ.get("TILEQR_REQUAL_N", "32768"))
NB = int(os.environ.get("TILEQR_REQUAL_NB", "256"))
BE = int(os.environ.get("TILEQR_REQUAL_BE", "2"))
SP = int(os.environ.get("TILEQR_REQUAL_SP", "8"))
FLOPS = 2.0 * N * N * (N - N / 3.0)
INTERP = jax.default_backend() != "tpu"
CB = min(4096, N // 2)


def sync(x):
    _ = np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[0])


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] nb={NB} be={BE} sp={SP}: {msg}",
          flush=True)


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


def gen_blk(j0):
    return jax.jit(
        lambda: jax.random.normal(
            jax.random.fold_in(jax.random.PRNGKey(0), j0 // CB),
            (N, CB), jnp.float32,
        )
    )()


_put_blk = jax.jit(
    lambda a, blk, j0: jax.lax.dynamic_update_slice(a, blk, (0, j0)),
    donate_argnums=(0,),
)


def gen_a(buf=None):
    a = buf if buf is not None else jax.jit(
        lambda: jnp.zeros((N, N), jnp.float32)
    )()
    for j in range(N // CB):
        a = _put_blk(a, gen_blk(j * CB), jnp.int32(j * CB))
    sync(a)
    return a


def settle():
    sync(jax.jit(lambda: jnp.ones((8, 8), jnp.float32))())
    time.sleep(10.0)


def main():
    log(f"device: {jax.devices()}")

    def run(buf=None):
        ap = gen_a(buf=buf)
        t0 = time.perf_counter()
        r, panels = qr_hr_chunked(ap, NB, precision="highest",
                                  interpret=INTERP, barrier_every=BE,
                                  seg_panels=SP)
        sync(r)
        return time.perf_counter() - t0, r, panels

    t_cold, r, panels = run()
    log(f"cold factor {t_cold:.1f} s")
    free(panels)
    settle()
    buf = r
    for i in (1, 2):
        t_w, r, panels = run(buf=buf)
        log(f"warm factor #{i} {t_w*1e3:.1f} ms = {FLOPS/t_w/1e12:.2f} TFLOP/s")
        free(panels)
        settle()
        buf = r


if __name__ == "__main__":
    main()
