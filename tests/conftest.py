"""Test configuration.

Tests run on a *local CPU* backend with 8 virtual devices (the standard way
to exercise pod-slice sharding code without a pod).  The session environment
pins Python processes to a remote-tunneled axon TPU (sitecustomize +
JAX_PLATFORMS=axon), which would make eager test dispatch orders of magnitude
slower and occupy the bench chip — so before any backend is initialized we
force the platform back to CPU and request 8 virtual host devices.
"""
import os

# Prefer the vmapped engine path in tests: the SoA path's scalar-unrolled
# HLO targets the TPU compiler and compiles ~10x slower on XLA-CPU, which
# multiplies across the suite's jit variants.  Parity between the paths is
# asserted explicitly in tests/test_soa.py; ceiling (overhang) worlds still
# take the SoA path regardless (physics/engine.py:step_batch).
os.environ.setdefault("AGILITY_ENGINE", "vmap")

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


def pytest_addoption(parser):
    parser.addoption(
        "--runslow", action="store_true", default=False,
        help="run tests marked slow (the nightly profile; default run "
             "deselects them to keep the edit-test loop under ~10 min)")


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: long-running test (>~45 s CPU) — deselected by "
                   "default, run with --runslow or -m slow")


def pytest_collection_modifyitems(config, items):
    if config.getoption("--runslow") or config.getoption("-m"):
        return
    skip = pytest.mark.skip(reason="slow: run with --runslow (nightly)")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)


@pytest.fixture
def rng():
    return np.random.default_rng(0)
