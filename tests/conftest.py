"""Test harness config: run everything on an 8-device virtual CPU mesh.

The environment preloads jax at interpreter start (so JAX_PLATFORMS from
the env is already captured); ``jax.config.update`` is the reliable way to
force the CPU platform, and XLA_FLAGS is still read lazily at backend init.
"""

import os
import sys

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: end-to-end training / multi-minute tests, excluded from the "
        "fast contract tier (`make test-fast` / `-m 'not slow'`)",
    )
