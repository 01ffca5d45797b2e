"""Round-2 config-3 measurement: tall-leaf/wide-arity TSQR tree vs chain."""
import sys

sys.path.insert(0, "/root/repo")
import numpy as np, time, jax, jax.numpy as jnp  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from tileqr.drivers.tsqr import tsqr_factor  # noqa: E402
from tileqr.drivers.square import qr_tiled  # noqa: E402


def flops(m, n):
    return 2 * n * n * (m - n / 3)


def sync(r):
    _ = np.asarray(jax.tree_util.tree_leaves(r)[0].ravel()[0])


def run_once(f, x):
    t0 = time.perf_counter()
    sync(f(x))
    return time.perf_counter() - t0


def chain_time(make, x, k, reps=3):
    fk, f1 = make(k), make(1)
    sync(fk(x))
    sync(f1(x))
    tk = min(run_once(fk, x) for _ in range(reps))
    t1 = min(run_once(f1, x) for _ in range(reps))
    return (tk - t1) / (k - 1)


rng = np.random.default_rng(0)
M, N = 1048576, 512
a = jnp.asarray(rng.standard_normal((M, N)).astype(np.float32))

# --- tree (tall staged leaves, arity 8) ---
def mk_tree(k):
    @jax.jit
    def f(x):
        r = None
        for _ in range(k):
            r = tsqr_factor(x, 512, ib=128).r
            x = x + r[0, 0] * jnp.float32(1e-12)
        return x

    return f


t = chain_time(mk_tree, a, 2, reps=3)
print(f"tree 1048576x512 (leaf 4096, arity 8, ib=128): {t*1e3:.1f} ms  "
      f"{flops(M,N)/t/1e12:.2f} TFLOP/s", flush=True)

# correctness
f = tsqr_factor(a, 512, ib=128)
r = np.asarray(f.r).astype(np.float64)
rn = np.linalg.qr(np.asarray(a), mode="r")
s = np.sign(np.diag(rn)) * np.sign(np.diag(r))
s[s == 0] = 1
print("tree relerr vs numpy R:",
      np.linalg.norm(r * s[:, None] - rn) / np.linalg.norm(rn), flush=True)

# --- chain (r1 baseline path) ---
def mk_chain(k):
    @jax.jit
    def f(x):
        for _ in range(k):
            packed, rd, tg, panels = qr_tiled(x, 256, chunk=4)
            x = x + rd[0, 0, 0] * jnp.float32(1e-12)
        return x

    return f


t = chain_time(mk_chain, a, 2, reps=2)
print(f"chain 1048576x512 (nb=256, c=4, ib=128): {t*1e3:.1f} ms  "
      f"{flops(M,N)/t/1e12:.2f} TFLOP/s", flush=True)
