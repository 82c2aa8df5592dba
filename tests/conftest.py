"""Test configuration.

Tests run on a *local CPU* backend with 8 virtual devices (the standard way
to exercise pod-slice sharding code without a pod).  The session environment
pins Python processes to a remote-tunneled axon TPU (sitecustomize +
JAX_PLATFORMS=axon), which would make eager test dispatch orders of magnitude
slower and occupy the bench chip — so before any backend is initialized we
force the platform back to CPU and request 8 virtual host devices.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
