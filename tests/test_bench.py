"""Bench harness smoke tests (component C11, SURVEY.md §2.1).

Round-1 lesson: the advertised ``--check`` path crashed after a driver
refactor because nothing exercised it. These CPU-backend smokes pin every
bench entry point, check flag included, to a finite result.
"""

import math

import pytest

from tileqr.bench.run import bench_batched, bench_jnp_qr, bench_square, bench_tsqr


@pytest.mark.parametrize(
    "method,driver",
    [("hh", "static"), ("hh", "dynamic"), ("hr", "static"), ("hr", "chunked")],
)
def test_bench_square_check(method, driver):
    """Every shipping square path is one harness call (VERDICT r3 weak-#2),
    each with the full-width streamed relerr."""
    # 128×128 at nb=64: 2 panels — the minimal geometry that exercises
    # every driver's panel loop (all drivers require n % nb == 0: the tile
    # reshape is (n//nb, nb, ...), so no smaller ragged shrink is possible)
    rec = bench_square(128, 64, 32, "highest", chain=2, check=True,
                       method=method, driver=driver)
    assert rec["bench"] == "qr_square"
    assert rec["method"] == method and rec["driver"] == driver
    assert rec["ms"] > 0 and rec["tflops"] > 0
    assert math.isfinite(rec["relerr"])
    assert rec["relerr"] < 1e-5


def test_bench_square_rejects_bad_combo():
    with pytest.raises(SystemExit):
        bench_square(128, 64, 32, "highest", chain=2, check=False,
                     method="hr", driver="dynamic")
    with pytest.raises(SystemExit):
        bench_square(100, 64, 32, "highest", chain=2, check=False,
                     method="hr", driver="static")


@pytest.mark.parametrize("strategy", ["tree", "chain", "cholqr2"])
def test_bench_tsqr(strategy):
    # smallest geometry with real leaf/combine + chain-couple structure
    # (128×32, nb=64): the test pins the CLI plumbing + a finite checked
    # record, not perf — shrunk from 256×64/nb=128 (r5 fast-suite budget,
    # 41 s → ~12 s across the three params)
    rec = bench_tsqr(128, 32, 64, chain=2, strategy=strategy, check=True)
    assert rec["strategy"] == strategy
    assert rec["ms"] > 0 and rec["tflops"] > 0
    assert rec["relerr_r"] < 1e-5


def test_bench_batched_check():
    rec = bench_batched(8, 32, chain=2, check=True)
    assert rec["kernel"].startswith("grouped")
    assert rec["ms"] > 0
    assert rec["relerr_max"] < 1e-5


def test_bench_baseline():
    rec = bench_jnp_qr(128, chain=2)
    assert rec["ms"] > 0


def test_root_bench_contract_size_fallback(monkeypatch):
    """The driver artifact's safety net (bench.py, r5): the default
    contract-size (32768²) bench falls back to the 16384² gate config when
    the big run raises — and the fallback executes OUTSIDE the except
    block, after the failed run's frames (and their multi-GiB device
    buffers) are released, so the fallback itself cannot be starved of
    HBM by the exception traceback pinning them (r5 review finding #1)."""
    import gc
    import importlib
    import os
    import sys as _sys

    import jax

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    _sys.path.insert(0, repo)
    cache_dir = jax.config.jax_compilation_cache_dir
    bench = importlib.import_module("bench")
    # importing bench must not clobber the conftest's CPU cache settings
    # for the rest of the suite (r5 review: the module-level config.update
    # calls moved into main via _configure_cache)
    assert jax.config.jax_compilation_cache_dir == cache_dir
    monkeypatch.setattr(bench, "_configure_cache", lambda: None)
    calls = []

    def fake_bench(n):
        # no live exception may exist while the fallback runs
        assert _sys.exc_info() == (None, None, None)
        calls.append(n)
        if n > 16384:
            raise RuntimeError("RESOURCE_EXHAUSTED (simulated)")

    monkeypatch.setattr(bench, "_bench", fake_bench)
    monkeypatch.setattr(bench, "N", 32768)
    gc.collect()
    bench.main()
    assert calls == [32768, 16384]
    # at or below the gate size there is no net: the error must surface
    calls.clear()

    def always_fails(n):
        calls.append(n)
        raise RuntimeError("boom")

    monkeypatch.setattr(bench, "_bench", always_fails)
    monkeypatch.setattr(bench, "N", 16384)
    try:
        bench.main()
    except RuntimeError:
        pass
    else:  # pragma: no cover
        raise AssertionError("16384 failure must propagate")
    assert calls == [16384]
