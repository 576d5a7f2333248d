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
