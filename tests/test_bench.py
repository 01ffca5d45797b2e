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
