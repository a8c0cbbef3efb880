"""Test configuration: force JAX onto a virtual 8-device CPU mesh.

Multi-chip sharding is tested without TPU hardware via
xla_force_host_platform_device_count (see SURVEY.md §4).  This must run
before jax initializes its backends, hence the env mangling at import time.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: multi-GB / multi-minute parity tests")
