"""Test harness: force an 8-device CPU mesh before JAX initializes.

Multi-chip hardware is not available in CI; per SURVEY.md §4 we validate
mesh/sharding logic on virtual CPU devices
(``--xla_force_host_platform_device_count=8``).
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_enable_x64", False)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)
