"""Test config: run on a virtual 8-device CPU mesh so sharding tests work
without TPU hardware. Must set env before importing jax."""

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# the axon TPU plugin overrides JAX_PLATFORMS; force CPU via config instead
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
