"""Bench harness smoke tests (component C11, SURVEY.md §2.1).

Round-1 lesson: the advertised ``--check`` path crashed after a driver
refactor because nothing exercised it. These CPU-backend smokes pin every
bench entry point, check flag included, to a finite result.
"""

import math

from tileqr.bench.run import bench_batched, bench_jnp_qr, bench_square, bench_tsqr


def test_bench_square_check():
    rec = bench_square(128, 64, 32, "highest", chain=2, check=True)
    assert rec["bench"] == "qr_square"
    assert rec["ms"] > 0 and rec["tflops"] > 0
    assert math.isfinite(rec["relerr"])
    assert rec["relerr"] < 1e-5


def test_bench_tsqr():
    rec = bench_tsqr(512, 64, 128, chain=2)
    assert rec["ms"] > 0 and rec["tflops"] > 0


def test_bench_batched_check():
    rec = bench_batched(8, 32, chain=2, check=True)
    assert rec["kernel"].startswith("grouped")
    assert rec["ms"] > 0
    assert rec["relerr_max"] < 1e-5


def test_bench_baseline():
    rec = bench_jnp_qr(128, chain=2)
    assert rec["ms"] > 0
