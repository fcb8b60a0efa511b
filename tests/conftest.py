"""Test configuration: force the JAX CPU backend with 8 virtual devices.

The container routes JAX to a single remote TPU chip through the axon
plugin, whose registration overrides ``JAX_PLATFORMS``; tests must run
on host CPU (with a virtual 8-device mesh for sharding tests), so we
override the platform via ``jax.config`` *before* any backend is
initialized.  Benchmarks (``bench.py``) still use the real chip.
"""

import os
import sys

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
if "--xla_force_host_platform_device_count" not in os.environ["XLA_FLAGS"]:
    os.environ["XLA_FLAGS"] += " --xla_force_host_platform_device_count=8"

import jax

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REFERENCE_DATA = "/root/reference/tests"


def reference_path(*parts: str) -> str:
    return os.path.join(REFERENCE_DATA, *parts)
