"""Test config.

Two modes:
  * default: run on a virtual 8-device CPU mesh so sharding tests work
    without TPU hardware (tpu-marked tests are skipped);
  * QUADRAY_TPU_TESTS=1: keep the real TPU backend and run ONLY the
    tpu-marked tests (the hardware tier core_test.cpp validates with
    run0-vs-run1; here it is pallas-kernel-vs-golden + kernel-op
    conformance, see test_tpu.py).

Env must be set before importing jax.
"""

import os
import sys

import pytest

RUN_TPU = os.environ.get("QUADRAY_TPU_TESTS") == "1"

# persistent compilation cache: TPU Mosaic compiles of the megakernel
# cost minutes through the remote compile helper; cache them across runs
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/quadray_jax"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "5")

if not RUN_TPU:
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

if not RUN_TPU:
    # the axon TPU plugin overrides JAX_PLATFORMS; force CPU via config
    jax.config.update("jax_platforms", "cpu")


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "tpu: needs real TPU hardware (QUADRAY_TPU_TESTS=1)")


def pytest_collection_modifyitems(config, items):
    skip_tpu = pytest.mark.skip(reason="needs QUADRAY_TPU_TESTS=1 + TPU")
    skip_cpu = pytest.mark.skip(reason="CPU-tier test (unset "
                                "QUADRAY_TPU_TESTS to run)")
    for item in items:
        is_tpu = bool(item.get_closest_marker("tpu"))
        if is_tpu and not RUN_TPU:
            item.add_marker(skip_tpu)
        elif RUN_TPU and not is_tpu:
            item.add_marker(skip_cpu)
