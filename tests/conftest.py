"""Test harness configuration.

The suite runs on the CPU backend with 8 virtual XLA host devices — the
TPU-world "fake backend" for distributed tests (SURVEY.md §4): Pallas kernels
run in interpreter mode (selected automatically by tileqr when the backend is
not TPU) and the shard_map driver runs over an 8-device host mesh, so the
identical code paths are exercised without TPU hardware. Set
``TILEQR_TEST_TPU=1`` to instead run on the real TPU backend (compiled Mosaic
kernels; the virtual-device flag is not applied).
"""

import os

if not os.environ.get("TILEQR_TEST_TPU"):
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()

import jax  # noqa: E402

if not os.environ.get("TILEQR_TEST_TPU"):
    # The env var alone is not enough in this image: the axon sitecustomize
    # registers the TPU backend and overrides JAX_PLATFORMS, but the config
    # knob still wins if set before first backend use.
    jax.config.update("jax_platforms", "cpu")
    # fp64 oracles alongside fp32 paths — CPU only (x64 on TPU breaks
    # tracing: dtype promotion recursion + no native f64)
    jax.config.update("jax_enable_x64", True)
    # Persistent XLA:CPU compile cache (r5 fast-suite budget, VERDICT r4
    # next-#6): this box has ONE CPU core, so the interpret-mode suite is
    # dominated by XLA CPU compiles of the trace-unrolled shard_map/driver
    # programs — measured 3× on the heaviest tests warm-vs-cold. The dir is
    # gitignored (like the TPU .jax_cache) but persists across rounds on
    # this machine. Threshold 0: the suite's compile cost is a long tail of
    # sub-second kernel compiles (hundreds of interpret-mode pallas bodies),
    # not a few big programs — caching everything measured another ~15% off
    # the warm suite and the dir stays ~tens of MB.
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            ".jax_cache_cpu",
        ),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
else:
    # Real-chip runs reuse the repo's persistent compile cache (the 4096²
    # static executable takes ~45 min to build through this environment's
    # remote-compile service; bench.py/__graft_entry__ populate the cache).
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def pytest_collection_modifyitems(config, items):
    on_tpu = jax.default_backend() == "tpu"
    skip_tpu = pytest.mark.skip(reason="requires TILEQR_TEST_TPU=1 and a TPU")
    for item in items:
        if "tpu_only" in item.keywords and not on_tpu:
            item.add_marker(skip_tpu)


def pytest_configure(config):
    config.addinivalue_line("markers", "tpu_only: needs a real TPU backend")
    config.addinivalue_line("markers", "slow: long-running acceptance config")
