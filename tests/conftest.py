"""Test harness: simulate an 8-device CPU mesh so sharding/pjit paths are
exercised without TPU hardware (SURVEY.md §4)."""

import os

# Force CPU for unit tests. The sandbox's sitecustomize registers the TPU
# tunnel backend and sets jax_platforms programmatically (which overrides the
# JAX_PLATFORMS env var), so the config must be updated post-import too.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)
