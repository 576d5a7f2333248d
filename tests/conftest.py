"""Test config: run everything on a simulated 8-device CPU mesh so sharding
tests work without a pod (SURVEY.md section 4).

The environment's sitecustomize pre-imports jax and pins JAX_PLATFORMS=axon
(the real TPU), so plain env vars are latched before conftest runs; we
override through jax.config before any backend is initialized.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


def pytest_addoption(parser):
    parser.addoption("--runslow", action="store_true", default=False,
                     help="run tests marked slow (interpret-mode Pallas, "
                          "full-size golden parity)")


def pytest_collection_modifyitems(config, items):
    if config.getoption("--runslow") or os.environ.get("MVSDF_RUN_SLOW"):
        return
    skip = pytest.mark.skip(reason="slow test: pass --runslow to run")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)
