"""Tracing/profiling utilities (SURVEY.md §5 tracing row).

The reference's observability is CUDA-event timing; the TPU-native
equivalents here: a Perfetto trace contextmanager (``jax.profiler``), a
hard-sync timer that works around this environment's async-dispatch tunnel
(see BASELINE.md methodology), and an HLO dump helper for inspecting what
XLA/Mosaic actually scheduled.
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable

import numpy as np

import jax


@contextlib.contextmanager
def trace(dirname: str = "/tmp/tileqr-trace"):
    """Capture a Perfetto/XPlane trace of the enclosed block.

    View with ui.perfetto.dev or tensorboard --logdir=<dirname>.
    """
    jax.profiler.start_trace(dirname)
    try:
        yield dirname
    finally:
        jax.profiler.stop_trace()


def hard_sync(x) -> None:
    """Synchronize on a result reliably: a device→host transfer of one
    element. (block_until_ready under-reports on the axon RPC tunnel.)"""
    leaf = jax.tree_util.tree_leaves(x)[0]
    _ = np.asarray(leaf.ravel()[0])


def chained_time(make_chain: Callable[[int], Callable], x, k: int = 3, reps: int = 3) -> float:
    """Per-iteration device time via chained-executable differencing:
    (T_K − T_1)/(K − 1) with both chains single jitted executables.
    make_chain(k) must return a jitted f(x) applying the op k times with a
    data dependency between iterations."""
    fk, f1 = make_chain(k), make_chain(1)
    hard_sync(fk(x))
    hard_sync(f1(x))

    def once(f):
        t0 = time.perf_counter()
        hard_sync(f(x))
        return time.perf_counter() - t0

    tk = min(once(fk) for _ in range(reps))
    t1 = min(once(f1) for _ in range(reps))
    return max((tk - t1) / (k - 1), 1e-9)


def dump_hlo(fn, *args, stage: str = "stablehlo") -> str:
    """Lowered/compiled text of ``fn(*args)`` for kernel-schedule inspection."""
    lowered = jax.jit(fn).lower(*args)
    if stage == "stablehlo":
        return lowered.as_text()
    return lowered.compile().as_text()
