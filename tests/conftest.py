"""Test harness: force an 8-virtual-device CPU backend as the "fake TPU".

The session environment pins JAX_PLATFORMS=axon (a remote-TPU tunnel whose
per-transfer latency is ~seconds — unusable for unit tests), and a
sitecustomize re-exports it, so the env var alone is not enough: we override
through jax.config before any backend initializes.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture(scope="session", autouse=True)
def _assert_cpu():
    assert jax.devices()[0].platform == "cpu", jax.devices()
    assert len(jax.devices()) == 8, jax.devices()


@pytest.fixture
def rng():
    return np.random.default_rng(0)
