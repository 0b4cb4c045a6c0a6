"""Test harness: force an 8-device CPU mesh.

Multi-chip hardware is not available in CI; per SURVEY.md §4 we validate
mesh/sharding logic on virtual CPU devices
(``--xla_force_host_platform_device_count=8``).

NOTE: this image registers a remote-TPU ("axon") JAX backend from
sitecustomize at interpreter start, BEFORE conftest runs — so setting
JAX_PLATFORMS here is too late.  ``jax.config.update("jax_platforms", ...)``
after import does switch the platform as long as no backend has been used
yet, and XLA_FLAGS is still read lazily at CPU-client creation.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
assert jax.devices()[0].platform == "cpu", "tests must run on the CPU mesh"

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)


# compile-heavy modules get the `slow` marker so `pytest -m "not slow"`
# gives a fast (<5 min) CI signal; the full suite stays the merge gate
SLOW_MODULES = {
    "test_golden",
    "test_families",
    "test_pipeline",
    "test_multihost",
    "test_reference_attn",
    "test_parallel",
    "test_server",
    "test_from_pretrained",
    "test_multimodel",
    "test_torch_parity_fullgeom",
    "test_train_toy",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        if item.module.__name__ in SLOW_MODULES:
            item.add_marker(pytest.mark.slow)
